"""Four-step MXU NTT: roundtrip, ring-product oracle, engine agreement."""
import numpy as np
import pytest
import jax.numpy as jnp

from spiral_tpu.params import P_I, B_I
from spiral_tpu.arith.mod import mod_ctx
from spiral_tpu.arith.ntt import ntt_forward, ntt_inverse
from spiral_tpu.arith.ntt_mxu import FourStepNtt, crt_ntt_mxu
from spiral_tpu.arith.tables import ntt_tables

rng = np.random.default_rng(2)


@pytest.mark.parametrize("p,d", [(P_I, 256), (B_I, 256), (P_I, 2048)])
def test_roundtrip(p, d):
    eng = FourStepNtt(p, d)
    x = rng.integers(0, p, size=(7, d), dtype=np.uint64).astype(np.uint32)
    y = eng.inverse(eng.forward(jnp.asarray(x)))
    np.testing.assert_array_equal(np.asarray(y), x)


@pytest.mark.parametrize("p", [P_I, B_I])
def test_product_matches_stockham_engine(p):
    d = 256
    eng = FourStepNtt(p, d)
    tb = ntt_tables(p, d)
    ctx = mod_ctx(p)
    a = rng.integers(0, p, size=d, dtype=np.uint64).astype(np.uint32)
    b = rng.integers(0, p, size=d, dtype=np.uint64).astype(np.uint32)
    prod_mxu = eng.inverse(ctx.mul(eng.forward(jnp.asarray(a)),
                                   eng.forward(jnp.asarray(b))))
    prod_st = ntt_inverse(ctx.mul(ntt_forward(jnp.asarray(a), tb),
                                  ntt_forward(jnp.asarray(b), tb)), tb)
    np.testing.assert_array_equal(np.asarray(prod_mxu), np.asarray(prod_st))


def test_crt_wrapper():
    eng = crt_ntt_mxu(256)
    x = np.stack([
        rng.integers(0, P_I, size=(3, 256), dtype=np.uint64),
        rng.integers(0, B_I, size=(3, 256), dtype=np.uint64),
    ], axis=1).astype(np.uint32)
    y = eng.inverse(eng.forward(jnp.asarray(x)))
    np.testing.assert_array_equal(np.asarray(y), x)
