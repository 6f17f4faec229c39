"""Pallas-fused NTT engine: must match the MXU engine bit-for-bit.

Runs in interpret mode off-TPU; on TPU hardware the same kernels compile
via Mosaic (engine selected with SPIRAL_NTT=pallas).
"""
import numpy as np
import jax.numpy as jnp

from spiral_tpu.params import P_I, B_I
from spiral_tpu.arith.ntt_mxu import crt_ntt_mxu
from spiral_tpu.arith.ntt_pallas import CrtNttPallas


def test_pallas_matches_mxu_engine():
    d = 256
    rng = np.random.default_rng(0)
    x = np.stack([
        rng.integers(0, P_I, size=(70, d), dtype=np.uint64),
        rng.integers(0, B_I, size=(70, d), dtype=np.uint64),
    ], axis=1).astype(np.uint32)  # 70 polys: exercises tile padding
    ref = crt_ntt_mxu(d)
    pal = CrtNttPallas(d, interpret=True)
    f_ref = np.asarray(ref.forward(jnp.asarray(x)))
    f_pal = np.asarray(pal.forward(jnp.asarray(x)))
    np.testing.assert_array_equal(f_pal, f_ref)
    back = np.asarray(pal.inverse(jnp.asarray(f_ref)))
    np.testing.assert_array_equal(back, x)
