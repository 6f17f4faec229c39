"""Unit tests for u32-pair primitives, modular contexts, and the NTT."""
import numpy as np
import pytest
import jax.numpy as jnp

from spiral_tpu.params import P_I, B_I, Q
from spiral_tpu.arith.u32 import mul32_wide, add_pair, shr_pair
from spiral_tpu.arith.mod import mod_ctx
from spiral_tpu.arith.crt import (lift_pair, residues_from_pair,
                                  residues_to_int, int_to_residues)
from spiral_tpu.arith.ntt import crt_ntt, ntt_forward, ntt_inverse
from spiral_tpu.arith.tables import ntt_tables

rng = np.random.default_rng(0)


def rand_u32(n, lo=0, hi=2**32):
    return rng.integers(lo, hi, size=n, dtype=np.uint64).astype(np.uint32)


def pair_int(hi, lo):
    return (np.asarray(hi).astype(np.uint64) << np.uint64(32)) | np.asarray(
        lo).astype(np.uint64)


def test_mul32_wide():
    a, b = rand_u32(1000), rand_u32(1000)
    hi, lo = mul32_wide(jnp.asarray(a), jnp.asarray(b))
    got = pair_int(np.asarray(hi), np.asarray(lo))
    want = a.astype(np.uint64) * b.astype(np.uint64)
    np.testing.assert_array_equal(got, want)


def test_add_shift_pair():
    a = rng.integers(0, 2**63, size=500, dtype=np.uint64)
    b = rng.integers(0, 2**63, size=500, dtype=np.uint64)
    ah, al = (a >> np.uint64(32)).astype(np.uint32), a.astype(np.uint32)
    bh, bl = (b >> np.uint64(32)).astype(np.uint32), b.astype(np.uint32)
    hi, lo = add_pair(jnp.asarray(ah), jnp.asarray(al), jnp.asarray(bh),
                      jnp.asarray(bl))
    np.testing.assert_array_equal(pair_int(hi, lo), a + b)
    for s in (0, 5, 28, 32, 40, 63):
        hi2, lo2 = shr_pair(jnp.asarray(ah), jnp.asarray(al), s)
        np.testing.assert_array_equal(pair_int(hi2, lo2), a >> np.uint64(s))


@pytest.mark.parametrize("p", [P_I, B_I, 12289, 786433, 1073479681])
def test_mod_ctx(p):
    ctx = mod_ctx(p)
    v = rand_u32(2000)
    np.testing.assert_array_equal(
        np.asarray(ctx.reduce_u32(jnp.asarray(v))),
        v.astype(np.uint64) % p)
    a = rand_u32(2000, hi=p)
    b = rand_u32(2000, hi=p)
    ja, jb = jnp.asarray(a), jnp.asarray(b)
    np.testing.assert_array_equal(
        np.asarray(ctx.add(ja, jb)),
        (a.astype(np.uint64) + b) % p)
    np.testing.assert_array_equal(
        np.asarray(ctx.sub(ja, jb)),
        (a.astype(np.uint64) + p - b) % p)
    np.testing.assert_array_equal(
        np.asarray(ctx.mul(ja, jb)),
        (a.astype(np.uint64) * b) % p)
    # shoup path
    w = int(rng.integers(1, p))
    ws = int(ctx.shoup(np.array([w]))[0])
    np.testing.assert_array_equal(
        np.asarray(ctx.mul_shoup(ja, jnp.uint32(w), jnp.uint32(ws))),
        (a.astype(np.uint64) * w) % p)


def test_crt_lift_roundtrip():
    v = rng.integers(0, Q, size=1000, dtype=np.uint64).astype(object)
    x, y = int_to_residues(v)
    hi, lo = lift_pair(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_array_equal(pair_int(hi, lo).astype(object), v)
    rx, ry = residues_from_pair(hi, lo)
    np.testing.assert_array_equal(np.asarray(rx), x)
    np.testing.assert_array_equal(np.asarray(ry), y)
    back = residues_to_int(x, y)
    np.testing.assert_array_equal(back, v)


@pytest.mark.parametrize("p,d", [(P_I, 256), (B_I, 256), (P_I, 2048),
                                 (786433, 256)])
def test_ntt_roundtrip(p, d):
    tb = ntt_tables(p, d)
    x = rng.integers(0, p, size=(5, d), dtype=np.uint64).astype(np.uint32)
    y = ntt_inverse(ntt_forward(jnp.asarray(x), tb), tb)
    np.testing.assert_array_equal(np.asarray(y), x)


def _negacyclic_schoolbook(a, b, p):
    d = len(a)
    res = [0] * d
    for i in range(d):
        for j in range(d):
            v = int(a[i]) * int(b[j]) % p
            if i + j < d:
                res[i + j] = (res[i + j] + v) % p
            else:
                res[i + j - d] = (res[i + j - d] - v) % p
    return np.array(res, dtype=np.uint32)


@pytest.mark.parametrize("p", [P_I, B_I])
def test_ntt_pointwise_is_negacyclic_product(p):
    d = 64
    tb = ntt_tables(p, d)
    a = rng.integers(0, p, size=d, dtype=np.uint64).astype(np.uint32)
    b = rng.integers(0, p, size=d, dtype=np.uint64).astype(np.uint32)
    ctx = mod_ctx(p)
    fa = ntt_forward(jnp.asarray(a), tb)
    fb = ntt_forward(jnp.asarray(b), tb)
    prod = ntt_inverse(ctx.mul(fa, fb), tb)
    np.testing.assert_array_equal(np.asarray(prod),
                                  _negacyclic_schoolbook(a, b, p))


def test_crt_ntt_both_limbs():
    eng = crt_ntt(256)
    x = np.stack([
        rng.integers(0, P_I, size=(3, 256), dtype=np.uint64),
        rng.integers(0, B_I, size=(3, 256), dtype=np.uint64),
    ], axis=1).astype(np.uint32)
    y = eng.inverse(eng.forward(jnp.asarray(x)))
    np.testing.assert_array_equal(np.asarray(y), x)
