"""Pallas-fused NTT engine (arith/ntt_pallas.py).

The engine uses its own (self-consistent) NTT-domain element order, so the
contract tested is the ring contract, not slot-order equality with the
MXU engine: inverse(forward(x)) == x, and pointwise products in its NTT
domain implement exactly the same negacyclic convolution as the MXU
engine's domain.  Runs in interpret mode off-TPU; on TPU the same kernels
compile via Mosaic (engine selected with SPIRAL_NTT=pallas).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spiral_tpu.params import P_I, B_I
from spiral_tpu.arith.ntt_mxu import crt_ntt_mxu
from spiral_tpu.arith.ntt_pallas import CrtNttPallas


def _rand(rng, n, d):
    return np.stack([
        rng.integers(0, P_I, size=(n, d), dtype=np.uint64),
        rng.integers(0, B_I, size=(n, d), dtype=np.uint64),
    ], axis=1).astype(np.uint32)


def test_pallas_roundtrip_and_convolution():
    d = 2048
    rng = np.random.default_rng(0)
    x = _rand(rng, 70, d)     # 70 polys: exercises tile padding
    pal = CrtNttPallas(d, interpret=True)

    fx = pal.forward(jnp.asarray(x))
    back = np.asarray(pal.inverse(fx))
    np.testing.assert_array_equal(back, x)

    # ring contract: pointwise product in pallas domain == pointwise
    # product in mxu domain, compared in coefficient space
    a = _rand(rng, 2, d)
    b = _rand(rng, 2, d)
    mxu = crt_ntt_mxu(d)

    def conv(eng, aa, bb):
        fa = eng.forward(jnp.asarray(aa))
        fb = eng.forward(jnp.asarray(bb))
        prod = []
        for li, p in enumerate((P_I, B_I)):
            v = (fa[..., li, :].astype(jnp.uint64) *
                 fb[..., li, :].astype(jnp.uint64)) % p
            prod.append(v.astype(jnp.uint32))
        return np.asarray(eng.inverse(jnp.stack(prod, axis=-2)))

    np.testing.assert_array_equal(conv(pal, a, b), conv(mxu, a, b))


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="Mosaic-compiled path needs TPU hardware "
                           "(run with SPIRAL_TEST_TPU=1 on a TPU machine)")
def test_pallas_compiled_matches_interpreted():
    """The production (interpret=False, Mosaic-compiled) kernel — the
    default engine on TPU — must agree bit-for-bit with the interpreted
    kernel on round-trip and on NTT-domain values (ADVICE r2: hardware
    correctness must not rest on ad-hoc bench runs)."""
    d = 2048
    rng = np.random.default_rng(1)
    x = _rand(rng, 70, d)
    hw = CrtNttPallas(d, interpret=False)
    it = CrtNttPallas(d, interpret=True)

    fx_hw = np.asarray(hw.forward(jnp.asarray(x)))
    fx_it = np.asarray(it.forward(jnp.asarray(x)))
    np.testing.assert_array_equal(fx_hw, fx_it)
    back = np.asarray(hw.inverse(jnp.asarray(fx_hw)))
    np.testing.assert_array_equal(back, x)
