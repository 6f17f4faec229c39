"""Batched multi-query serving: one dispatch, DB streamed once per batch.

Oracle pattern as everywhere (self-generated DB, exact record compare);
additionally checks the batch path agrees with the single-query path on
identical queries.
"""
import numpy as np
import pytest

from spiral_tpu.params import preset
from spiral_tpu.pir import SpiralClient, SpiralServer
from spiral_tpu.server.db import encode_db, random_db


@pytest.mark.parametrize("preset_name", ["tiny", "tiny_stream"])
def test_batch_decode_correct(preset_name):
    params = preset(preset_name)
    rng = np.random.default_rng(7)
    client = SpiralClient(params, seed=3)
    pub = client.setup()
    pts = random_db(params, rng)
    server = SpiralServer(params, encode_db(pts, params), pub)

    idxs = [1, params.total_n - 1, int(rng.integers(0, params.total_n))]
    queries = [client.query(i) for i in idxs]
    responses, dt = server.process_query_batch(queries)
    assert dt > 0
    assert len(responses) == len(idxs)
    for idx, resp in zip(idxs, responses):
        out = client.decode(resp)
        assert np.array_equal(out, pts[idx].astype(object)), idx


def test_batch_matches_single():
    params = preset("tiny")
    rng = np.random.default_rng(11)
    client = SpiralClient(params, seed=5)
    pub = client.setup()
    pts = random_db(params, rng)
    server = SpiralServer(params, encode_db(pts, params), pub)

    q = client.query(2)
    single, _ = server.process_query_fused(q)
    batch, _ = server.process_query_batch([q, q])
    for resp in batch:
        assert np.array_equal(resp.first_row, single.first_row)
        assert np.array_equal(resp.rest_rows, single.rest_rows)
