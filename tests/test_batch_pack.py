"""Batched multi-query serving for the pack (high-rate) variant."""
import numpy as np
import pytest

from spiral_tpu.params import preset
from spiral_tpu.pack import PackClient, PackServer, encode_pack_db


@pytest.mark.parametrize("preset_name", ["tiny_pack", "tiny_stream_pack"])
def test_pack_batch_decode_correct(preset_name):
    params = preset(preset_name)
    rng = np.random.default_rng(17)
    client = PackClient(params, seed=9)
    pub = client.setup()
    pts = rng.integers(0, params.p_db, size=(
        params.total_n, params.out_n, params.out_n, params.poly_len),
        dtype=np.int16)
    server = PackServer(params, encode_pack_db(pts, params), pub)

    idxs = [0, params.total_n - 1]
    queries = [client.query(i) for i in idxs]
    responses, dt = server.process_query_batch(queries)
    assert dt > 0
    for idx, resp in zip(idxs, responses):
        out = client.decode(resp)
        assert np.array_equal(out, pts[idx].astype(object)), idx
