"""Oversized items: factor sub-databases share one query."""
import numpy as np

from spiral_tpu.params import preset
from spiral_tpu.factored import (FactoredSpiralServer, decode_factored,
                                 encode_factored_db)
from spiral_tpu.pir import SpiralClient


def test_factored_item_roundtrip():
    params = preset("tiny")
    F = 3
    rng = np.random.default_rng(21)
    pts = rng.integers(0, params.p_db, size=(
        params.total_n, F, params.n0, params.n2, params.poly_len),
        dtype=np.int64)
    client = SpiralClient(params, seed=2)
    pub = client.setup()
    server = FactoredSpiralServer(params, encode_factored_db(pts, params),
                                  pub)
    idx = 9
    resps, _ = server.process_query(client.query(idx))
    out = decode_factored(client, resps)
    np.testing.assert_array_equal(out, pts[idx].astype(object))


def test_factored_fused_serving_path():
    params = preset("tiny")
    F = 2
    rng = np.random.default_rng(22)
    pts = rng.integers(0, params.p_db, size=(
        params.total_n, F, params.n0, params.n2, params.poly_len),
        dtype=np.int64)
    client = SpiralClient(params, seed=3)
    pub = client.setup()
    server = FactoredSpiralServer(params, encode_factored_db(pts, params),
                                  pub)
    resps, seconds = server.process_query_fused(client.query(5))
    assert seconds > 0
    np.testing.assert_array_equal(decode_factored(client, resps),
                                  pts[5].astype(object))
