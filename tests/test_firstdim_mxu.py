"""MXU int8-limb first-dim path must agree exactly with the u32 path."""
import jax
import numpy as np
import jax.numpy as jnp

from spiral_tpu.params import preset
from spiral_tpu.server.db import EncodedDb
from spiral_tpu.server.firstdim import (db_to_mxu_limbs, finish_mxu_output,
                                        multiply_query_by_db,
                                        multiply_query_by_db_mxu)
from spiral_tpu.params import P_I, B_I


def test_mxu_matches_u32_path():
    params = preset("tiny")
    rng = np.random.default_rng(5)
    d, K = params.poly_len, params.dim0 * params.n0
    mods = np.array([P_I, B_I], dtype=np.uint64).reshape(1, 1, 1, 2, 1)
    db_u32 = (rng.integers(0, 2**28, size=(
        params.num_per, params.n2, K, 2, d), dtype=np.uint64) % mods
    ).astype(np.uint32)
    qk = (rng.integers(0, 2**28, size=(K, params.n1, 2, d),
                       dtype=np.uint64) %
          mods.reshape(1, 1, 2, 1)).astype(np.uint32)

    db = EncodedDb(data=jnp.asarray(db_u32), params=params)
    want = np.asarray(multiply_query_by_db(db, jnp.asarray(qk)))

    limbs = db_to_mxu_limbs(jnp.asarray(db_u32))
    got = finish_mxu_output(
        multiply_query_by_db_mxu(limbs, jnp.asarray(qk)),
        params.num_per, params.n2)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_fused_fdim_matches_xla_path():
    """The Pallas fused first-dim kernel (matmul + limb recombination in
    one kernel) must equal the XLA limb path bit-for-bit (interpret off-
    TPU; the compiled path is covered by SPIRAL_TEST_TPU=1 runs)."""
    import jax
    from spiral_tpu.server.firstdim import (db_to_mxu_limbs,
                                            fused_fdim_supported,
                                            multiply_query_by_db_fused,
                                            multiply_query_by_db_mxu)
    rng = np.random.default_rng(7)
    num_per, n2, K, d, n1 = 64, 2, 32, 2048, 3
    mods = np.array([P_I, B_I], dtype=np.uint64).reshape(1, 1, 1, 2, 1)
    db = (rng.integers(0, 1 << 28, size=(num_per, n2, K, 2, d),
                       dtype=np.uint64) % mods).astype(np.uint32)
    qk = (rng.integers(0, 1 << 28, size=(K, n1, 2, d), dtype=np.uint64)
          % mods.reshape(1, 1, 2, 1)).astype(np.uint32)
    limbs = db_to_mxu_limbs(jnp.asarray(db))
    assert fused_fdim_supported(limbs)
    a = multiply_query_by_db_mxu(limbs, jnp.asarray(qk))
    interp = jax.default_backend() != "tpu"
    b = multiply_query_by_db_fused(limbs, jnp.asarray(qk),
                                   interpret=interp)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
