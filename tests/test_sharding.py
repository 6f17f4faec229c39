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
