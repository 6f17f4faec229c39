"""End-to-end tests for SpiralPack / SpiralStreamPack (high-rate variant)."""
import numpy as np
import pytest

from spiral_tpu.params import preset
from spiral_tpu.pack import PackClient, PackServer, encode_pack_db


def _run(params, nonoise, seed=3):
    rng = np.random.default_rng(seed)
    client = PackClient(params, seed=seed, nonoise=nonoise)
    pub = client.setup()
    pts = rng.integers(0, params.p_db,
                       size=(params.total_n, params.out_n, params.out_n,
                             params.poly_len), dtype=np.int64)
    db = encode_pack_db(pts, params)
    server = PackServer(params, db, pub)
    idx = int(rng.integers(0, params.total_n))
    q = client.query(idx)
    resp, timings = server.process_query(q)
    out = client.decode(resp)
    return bool(np.array_equal(out, pts[idx].astype(object))), timings


@pytest.mark.parametrize("nonoise", [True, False])
def test_streampack_e2e(nonoise):
    ok, _ = _run(preset("tiny_stream_pack"), nonoise)
    assert ok


@pytest.mark.parametrize("nonoise", [True, False])
def test_pack_e2e(nonoise):
    ok, _ = _run(preset("tiny_pack"), nonoise)
    assert ok


def test_pack_e2e_out_n4():
    """out_n=4 (the model-selected spiralpack_20_256 shape)."""
    ok, _ = _run(preset("tiny_pack4"), nonoise=False)
    assert ok


def test_streampack_e2e_big_p():
    """p_db=2^16, out_n=4 (the model-selected spiralstreampack shape)."""
    ok, _ = _run(preset("tiny_stream_pack_bigp"), nonoise=False)
    assert ok


def test_pack_e2e_out_n8():
    """out_n=8: the widest packing the search artifact emits
    (paramgen/sweep.py out_n grid; ref: select_params.py n sweep)."""
    ok, _ = _run(preset("tiny_pack8"), nonoise=False)
    assert ok


def test_streampack_e2e_paper_gadgets():
    """The paper's SpiralStreamPack gadget widths (t_conv=t_exp=56,
    t_gsw=2, n=4, p=1024 — BASELINE.md's 2^20 x 256 B row) on a tiny
    ring (ref: src/testing.cpp:777-1155 testHighRate)."""
    ok, _ = _run(preset("tiny_stream_pack_paper"), nonoise=False)
    assert ok
