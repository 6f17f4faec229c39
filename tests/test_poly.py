"""Property tests for PolyMat algebra and gadget decomposition."""
import numpy as np
import pytest
import jax.numpy as jnp

from spiral_tpu.params import Q, get_bits_per
from spiral_tpu.core.poly import PolyMat
from spiral_tpu.core.gadget import (build_gadget, gadget_invert,
                                    gadget_invert_signed)
from spiral_tpu.core.rescale import rescale_array

rng = np.random.default_rng(1)
D = 64


def rand_pm(rows, cols, d=D, mod=Q):
    v = np.empty((rows, cols, d), dtype=object)
    flat = rng.integers(0, min(mod, 2**63), size=(rows, cols, d), dtype=np.uint64)
    for idx in np.ndindex(v.shape):
        v[idx] = int(flat[idx]) % mod
    return v


def negacyclic_matmul_oracle(a, b, mod=Q):
    """(R,M,d) x (M,C,d) object arrays -> (R,C,d), negacyclic mod `mod`."""
    R, M, d = a.shape
    C = b.shape[1]
    out = np.zeros((R, C, d), dtype=object)
    for r in range(R):
        for c in range(C):
            for m in range(M):
                for i in range(d):
                    ai = int(a[r, m, i])
                    if ai == 0:
                        continue
                    for j in range(d):
                        v = ai * int(b[m, c, j])
                        if i + j < d:
                            out[r, c, i + j] += v
                        else:
                            out[r, c, i + j - d] -= v
    return out % mod


def test_matmul_matches_oracle():
    a = rand_pm(2, 3)
    b = rand_pm(3, 2)
    pa = PolyMat.from_host(a).to_ntt()
    pb = PolyMat.from_host(b).to_ntt()
    got = (pa @ pb).from_ntt().to_host_int()
    want = negacyclic_matmul_oracle(a, b)
    np.testing.assert_array_equal(got, want)


def test_add_neg_roundtrip():
    a = rand_pm(2, 2)
    b = rand_pm(2, 2)
    pa, pb = PolyMat.from_host(a), PolyMat.from_host(b)
    np.testing.assert_array_equal((pa + pb).to_host_int(), (a + b) % Q)
    np.testing.assert_array_equal((pa - pb).to_host_int(), (a - b) % Q)
    np.testing.assert_array_equal((-pa).to_host_int(), (-a) % Q)


def test_automorph():
    a = rand_pm(1, 1)
    t = 2 * 3 + 1
    pa = PolyMat.from_host(a)
    got = pa.automorph(t).to_host_int()
    want = np.zeros_like(a)
    d = D
    for i in range(d):
        j = (i * t) % d
        sgn = -1 if ((i * t) // d) % 2 else 1
        want[0, 0, j] = (sgn * a[0, 0, i]) % Q
    np.testing.assert_array_equal(got, want)


def test_ntt_domain_automorph_consistency():
    """tau_t(a*b) == tau_t(a)*tau_t(b) sanity via the implementation."""
    a = rand_pm(1, 1)
    b = rand_pm(1, 1)
    t = D // 2 + 1
    pa, pb = PolyMat.from_host(a), PolyMat.from_host(b)
    lhs = ((pa.to_ntt() @ pb.to_ntt()).from_ntt().automorph(t)).to_host_int()
    rhs = ((pa.automorph(t).to_ntt() @ pb.automorph(t).to_ntt())
           .from_ntt().to_host_int())
    np.testing.assert_array_equal(lhs, rhs)


@pytest.mark.parametrize("t,rdim", [(8, 1), (4, 2), (56, 1), (3, 2)])
def test_gadget_invert_unsigned(t, rdim):
    m = 2
    mx = t * rdim
    x = rand_pm(rdim, m)
    px = PolyMat.from_host(x)
    ginv = gadget_invert(px, mx, rdim)
    G = build_gadget(rdim, mx, D)
    prod = (G.to_ntt() @ ginv.to_ntt()).from_ntt().to_host_int()
    bits = get_bits_per(t)
    if bits * t >= 56:
        np.testing.assert_array_equal(prod, x)
    else:
        np.testing.assert_array_equal(prod, x % (1 << (bits * t)))


@pytest.mark.parametrize("t", [8, 5, 2])
def test_gadget_invert_signed(t):
    rdim, m = 3, 2
    x = rand_pm(rdim, m)
    px = PolyMat.from_host(x)
    ginv = gadget_invert_signed(px, t)
    bits = get_bits_per(t)
    # check digit magnitudes are small (centered) and recomposition correct
    G = build_gadget(rdim, t * rdim, D)
    prod = (G.to_ntt() @ ginv.to_ntt()).from_ntt().to_host_int()
    if bits * t >= 56:
        np.testing.assert_array_equal(prod, x)
    else:
        np.testing.assert_array_equal(prod % (1 << (bits * t)),
                                      x % (1 << (bits * t)))
    # centered digit magnitude bound: signed digits stay <= z/2+1; the one
    # digit the reference leaves unsigned (k = t/2 - 1, ref spiral.cpp:289)
    # may reach z.
    dig = ginv.to_host_centered()
    z = 1 << bits
    assert np.max(np.abs(dig.astype(np.int64))) <= z


def test_rescale_roundtrip_small_error():
    v = rand_pm(1, 1)[0, 0]
    out_mod = 1 << 20
    r = rescale_array(v, Q, out_mod)
    # scaled back, error < Q/out_mod
    back = (np.asarray(r, dtype=object) * Q) // out_mod
    cent_v = np.where(v >= Q // 2, v - Q, v)
    cent_b = np.where(back >= Q // 2, back - Q, back)
    err = np.abs((cent_v - cent_b).astype(object))
    err = np.minimum(err, Q - err)
    assert int(np.max(err)) <= Q // out_mod
