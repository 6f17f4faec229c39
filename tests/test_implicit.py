"""Implicit working-set database mode (ref: src/spiral.cpp:1032-1081
dummyWorkingSet / --random-data)."""
import numpy as np
import jax.numpy as jnp

from spiral_tpu.params import Params
from spiral_tpu.server.db import random_implicit_db
from spiral_tpu.server.firstdim import (
    multiply_query_by_db_implicit, multiply_query_by_db_mxu)
from spiral_tpu.pir import SpiralClient, SpiralServer


def _params():
    return Params(nu_1=2, nu_2=2, p_db=256, q_prime_bits=20, t_gsw=8,
                  t_conv=4, t_exp=8, t_exp_right=8, poly_len=256)


def test_single_chunk_matches_direct():
    p = _params()
    rng = np.random.default_rng(0)
    db = random_implicit_db(p, rng, max_slab_bytes=1 << 40)
    assert db.num_chunks == 1 and db.slab_per == p.num_per
    K = p.dim0 * p.n0
    qk = jnp.asarray(rng.integers(
        0, 1 << 28, size=(K, p.n1, 2, p.poly_len)).astype(np.uint32))
    a = multiply_query_by_db_implicit(db.slab_limbs, qk, 1)
    b = multiply_query_by_db_mxu(db.slab_limbs, qk)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_chunked_shape_and_slab_rows():
    p = _params()
    rng = np.random.default_rng(1)
    # force a slab of 1 first-dim row -> num_per chunks
    row_bytes = p.n2 * p.dim0 * p.n0 * 2 * p.poly_len * 4
    db = random_implicit_db(p, rng, max_slab_bytes=row_bytes)
    assert db.slab_per == 1 and db.num_chunks == p.num_per
    K = p.dim0 * p.n0
    qk = jnp.asarray(rng.integers(
        0, 1 << 28, size=(K, p.n1, 2, p.poly_len)).astype(np.uint32))
    out = multiply_query_by_db_implicit(db.slab_limbs, qk, db.num_chunks)
    assert out.shape == (2, p.poly_len, p.n1, p.num_per * p.n2)
    # chunk 0 (roll by 0) must equal the direct slab product
    direct = multiply_query_by_db_mxu(db.slab_limbs, qk)
    np.testing.assert_array_equal(np.asarray(out[..., :p.n2]),
                                  np.asarray(direct))


def test_e2e_pipeline_runs_implicit():
    """Full server pipeline over an implicit DB produces a well-formed
    response (decoded contents are meaningless by construction)."""
    p = _params()
    rng = np.random.default_rng(2)
    client = SpiralClient(p, seed=1)
    pub = client.setup()
    db = random_implicit_db(p, rng, max_slab_bytes=1 << 16)
    assert db.num_chunks > 1
    server = SpiralServer(p, db, pub)
    query = client.query(3)
    resp, timings = server.process_query(query)
    out = client.decode(resp)
    assert out.shape == (p.n0, p.n2, p.poly_len)
    assert timings.first_multiply_us > 0


def test_encode_db_chunked_matches_encode_db():
    """The streaming int16-upload encoder must produce the exact serving
    tensor of the one-shot encoder."""
    import numpy as np
    from spiral_tpu.params import preset
    from spiral_tpu.server.db import encode_db, encode_db_chunked, random_db

    p = preset("tiny")
    pts = random_db(p, np.random.default_rng(3))
    a = encode_db(pts, p).data
    b = encode_db_chunked(pts, p, chunk_items=6).data
    assert np.array_equal(np.asarray(a), np.asarray(b))


def test_pack_implicit_pipeline_runs():
    """Implicit (huge-DB) mode for the pack variant: full pipeline runs
    and produces a well-formed response (random slab; correctness is
    intentionally unchecked, ref exp_lut.json is_corr=false)."""
    from spiral_tpu.params import preset
    from spiral_tpu.pack import PackClient, PackServer
    from spiral_tpu.server.db import random_implicit_pack_db

    p = preset("tiny_pack")
    rng = np.random.default_rng(3)
    row_bytes = p.dim0 * 2 * p.poly_len * 4
    db = random_implicit_pack_db(p, rng, max_slab_bytes=2 * row_bytes)
    assert db.num_chunks == p.out_n ** 2 * p.num_per // db.slab_per
    client = PackClient(p, seed=1)
    server = PackServer(p, db, client.setup())
    resp, s = server.process_query_fused(client.query(0))
    assert s > 0
    assert np.asarray(resp.first_row).shape == (1, p.out_n, p.poly_len)


def test_implicit_batch_serving_runs():
    """Batched serving over an implicit DB (the huge-DB aggregate-
    throughput mode): same chunked-slab arithmetic with the batch folded
    into the MXU lhs.  Correctness of the underlying kernel vs the
    explicit path is covered above; here the full batch pipeline must
    run and emit responses of the singles' shape."""
    p = _params()
    rng = np.random.default_rng(5)
    client = SpiralClient(p, seed=5)
    pub = client.setup()
    db = random_implicit_db(p, rng, max_slab_bytes=1 << 40)
    server = SpiralServer(p, db, pub)
    queries = [client.query(int(rng.integers(0, p.total_n)))
               for _ in range(2)]
    resps, dt = server.process_query_batch(queries)
    assert len(resps) == 2
    single, _ = server.process_query_fused(queries[0])
    assert resps[0].first_row.shape == single.first_row.shape
    assert resps[0].rest_rows.shape == single.rest_rows.shape
