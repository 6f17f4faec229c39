"""Multi-device sharding: the psum-reduced first-dim must match 1-device."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spiral_tpu.params import preset, P_I, B_I
from spiral_tpu.arith.ntt import crt_ntt
from spiral_tpu.core.poly import matmul_raw, sub_raw
from spiral_tpu.server.db import EncodedDb
from spiral_tpu.server.fold import fold_ciphertexts
from spiral_tpu.dist.shard import (make_db_mesh, shard_db,
                                   sharded_firstdim_and_fold)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_firstdim_fold_matches_single_device():
    params = preset("tiny")
    d, K = params.poly_len, params.dim0 * params.n0
    rng = np.random.default_rng(11)
    mods = np.array([P_I, B_I], dtype=np.uint64).reshape(1, 1, 1, 2, 1)

    db_u32 = (rng.integers(0, 2**28, size=(
        params.num_per, params.n2, K, 2, d), dtype=np.uint64) % mods
    ).astype(np.uint32)
    qk = (rng.integers(0, 2**28, size=(K, params.n1, 2, d),
                       dtype=np.uint64) %
          mods.reshape(1, 1, 2, 1)).astype(np.uint32)
    qgs = (rng.integers(0, 2**28, size=(
        2, params.further_dims, params.n1, params.m2, 2, d),
        dtype=np.uint64) % mods[None]).astype(np.uint32)
    q_pos, q_neg = jnp.asarray(qgs[0]), jnp.asarray(qgs[1])

    # single device reference
    eng = crt_ntt(d)
    out = matmul_raw(jnp.asarray(db_u32), jnp.asarray(qk))
    cts = eng.inverse(out.transpose(0, 2, 1, 3, 4))
    want = fold_ciphertexts(cts, q_pos, q_neg, params)

    # sharded over 8 devices
    mesh = make_db_mesh(jax.devices()[:8])
    step = sharded_firstdim_and_fold(params, mesh)
    db_sharded = shard_db(jnp.asarray(db_u32), mesh)
    got = step(db_sharded, jnp.asarray(qk), q_pos, q_neg)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


TINY8 = None


def _tiny8():
    """Tiny config with num_per=8 so rows shard over the 8 virtual devices."""
    global TINY8
    if TINY8 is None:
        from spiral_tpu.params import Params
        TINY8 = Params(nu_1=2, nu_2=3, p_db=256, q_prime_bits=20, t_gsw=8,
                       t_conv=4, t_exp=8, t_exp_right=8, poly_len=256)
    return TINY8


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_mesh_server_full_pipeline_matches_and_decodes():
    """The production mesh mode: row-sharded DB through the FULL pipeline
    (expand -> comp -> conv -> sharded MXU fdim -> fold -> modswitch) gives
    bit-identical responses to the single-device server, and decodes."""
    from spiral_tpu.pir import SpiralClient, SpiralServer
    from spiral_tpu.server.db import encode_db, random_db

    params = _tiny8()
    rng = np.random.default_rng(5)
    pts = random_db(params, rng)
    db = encode_db(pts, params)
    client = SpiralClient(params, seed=2)
    pub = client.setup()
    idx = 19
    query = client.query(idx)

    ref_server = SpiralServer(params, db, pub)
    resp_ref, _ = ref_server.process_query_fused(query)

    mesh = make_db_mesh(jax.devices()[:8])
    mesh_server = SpiralServer(params, db, pub, mesh=mesh)
    resp_mesh, _ = mesh_server.process_query_fused(query)

    np.testing.assert_array_equal(np.asarray(resp_mesh.first_row),
                                  np.asarray(resp_ref.first_row))
    np.testing.assert_array_equal(np.asarray(resp_mesh.rest_rows),
                                  np.asarray(resp_ref.rest_rows))
    out = client.decode(resp_mesh)
    assert np.array_equal(out, pts[idx].astype(object))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_mesh_pack_server_matches_single_device():
    from spiral_tpu.params import preset
    from spiral_tpu.pack import PackClient, PackServer, encode_pack_db

    params = preset("tiny_pack")      # T*num_per = 16 rows over 8 devices
    rng = np.random.default_rng(6)
    pts = rng.integers(0, params.p_db, size=(
        params.total_n, params.out_n, params.out_n, params.poly_len),
        dtype=np.int16)
    db = encode_pack_db(pts, params)
    client = PackClient(params, seed=2)
    pub = client.setup()
    idx = 7
    query = client.query(idx)

    resp_ref, _ = PackServer(params, db, pub).process_query_fused(query)
    mesh = make_db_mesh(jax.devices()[:8])
    resp_mesh, _ = PackServer(params, db, pub,
                              mesh=mesh).process_query_fused(query)

    np.testing.assert_array_equal(np.asarray(resp_mesh.first_row),
                                  np.asarray(resp_ref.first_row))
    np.testing.assert_array_equal(np.asarray(resp_mesh.rest_rows),
                                  np.asarray(resp_ref.rest_rows))
    assert np.array_equal(client.decode(resp_mesh), pts[idx].astype(object))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_mesh_implicit_db_matches_single_device():
    """Sharded implicit (huge-DB) mode: chunk ranges split over devices
    must reproduce the single-device chunk stream bit-exactly."""
    from spiral_tpu.pir import SpiralClient, SpiralServer
    from spiral_tpu.server.db import random_implicit_db

    params = _tiny8()
    rng = np.random.default_rng(7)
    # slab covering 1 row -> num_chunks = 8, one per device
    db = random_implicit_db(params, rng, max_slab_bytes=1)
    assert db.num_chunks == 8
    client = SpiralClient(params, seed=2)
    pub = client.setup()
    query = client.query(3)

    resp_ref, _ = SpiralServer(params, db, pub).process_query_fused(query)
    mesh = make_db_mesh(jax.devices()[:8])
    resp_mesh, _ = SpiralServer(params, db, pub,
                                mesh=mesh).process_query_fused(query)
    np.testing.assert_array_equal(np.asarray(resp_mesh.first_row),
                                  np.asarray(resp_ref.first_row))
    np.testing.assert_array_equal(np.asarray(resp_mesh.rest_rows),
                                  np.asarray(resp_ref.rest_rows))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_mesh_fused_fdim_matches_xla_at_d2048():
    """Fused Pallas fdim per shard (shard-local limb-major layout,
    db_to_mxu_limbs shards=8) must be bit-equal to the XLA limb path on
    the same mesh at d=2048 (VERDICT r4 next #4: num_per*n2/n_dev = 128
    columns per device satisfies the Mosaic 128-lane constraint)."""
    import functools
    from jax.sharding import PartitionSpec as P
    from spiral_tpu.server.firstdim import (
        db_to_mxu_limbs, fused_fdim_supported_shape,
        multiply_query_by_db_fused, multiply_query_by_db_mxu, N_LIMBS)
    from spiral_tpu.dist.shard import shard_db_limbs

    d, K, n1, n2, num_per, n_dev = 2048, 8, 3, 2, 512, 8
    rng = np.random.default_rng(3)
    mods = np.array([P_I, B_I], dtype=np.uint64).reshape(1, 1, 1, 2, 1)
    db_u32 = (rng.integers(0, 2**28, size=(num_per, n2, K, 2, d),
                           dtype=np.uint64) % mods).astype(np.uint32)
    qk = (rng.integers(0, 2**28, size=(K, n1, 2, d), dtype=np.uint64) %
          mods.reshape(1, 1, 2, 1)).astype(np.uint32)
    qk = jnp.asarray(qk)

    m_local = num_per * n2 // n_dev
    assert fused_fdim_supported_shape((2, d, K, N_LIMBS * m_local))

    # XLA limb path on the (row-major, sharded) layout
    mesh = make_db_mesh(jax.devices()[:8])
    db_row = shard_db_limbs(
        db_to_mxu_limbs(jnp.asarray(db_u32), row_major=True), mesh)

    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(P(None, None, None, "db"), P()),
                       out_specs=P(None, None, None, "db"),
                       check_vma=False)
    def xla_path(dbs, qk):
        return multiply_query_by_db_mxu(dbs, qk, row_major=True)

    want = np.asarray(xla_path(db_row, qk))

    # fused Pallas kernel per shard on the shard-local limb-major layout
    db_jm = shard_db_limbs(
        db_to_mxu_limbs(jnp.asarray(db_u32), shards=n_dev), mesh)

    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(P(None, None, None, "db"), P()),
                       out_specs=P(None, None, None, "db"),
                       check_vma=False)
    def fused_path(dbs, qk):
        return multiply_query_by_db_fused(dbs, qk)

    got = np.asarray(fused_path(db_jm, qk))
    np.testing.assert_array_equal(got, want)
