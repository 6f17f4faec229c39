"""Four-step negacyclic NTT on the MXU.

The d-point cyclic NTT factorises as d = d1*d2:
    X[d1*e + c] = sum_b (w^{d1})^{be} * T[b,c] * [sum_a W1[a,c] x[d2*a+b]]
i.e. a d1-point DFT along one axis (matmul), an elementwise twiddle, and a
d2-point DFT along the other (matmul).  This replaces the reference's
Harvey butterfly network (ref: src/core.cpp:247-514) with two dense
matmuls — the shape the MXU systolic array is built for.

Exact integer arithmetic on the MXU:
  * the data operand splits into four 7-bit int8 limbs x_j;
  * instead of materialising all (j, i) limb-pair products, each matrix is
    pre-scaled per data-limb, W^{(j)} = (2^{7j} W) mod p, and ITS limbs
    form the rhs — the j axis joins the contraction, so the s32 output
    carries only the 4-way matrix-limb axis (4x less traffic than the
    naive 16 limb pairs);
  * accumulation bound: 4*K*127^2 < 2^31 for K <= d1 = 64.

The negacyclic psi-twist and the 1/d scale are folded into the matrices
and the twiddle table, so a transform is exactly: matmul, twiddle-mulmod,
matmul.  The NTT-domain evaluation ordering differs from arith/ntt.py's
Stockham order; both are valid pointwise conventions and one engine is
picked globally by crt_ntt().
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..params import B_I, P_I
from .mod import mod_ctx
from .tables import primitive_root

LIMB_BITS = 7
N_LIMBS = 4


def _limbs_i8(v):
    """u32 (..., K) -> int8 (..., 4, K) limb planes (j-major)."""
    parts = [((v >> (LIMB_BITS * j)) & jnp.uint32(0x7F)).astype(jnp.int8)
             for j in range(N_LIMBS)]
    return jnp.stack(parts, axis=-2)


def _prescaled_matrix_limbs(W: np.ndarray, p: int) -> np.ndarray:
    """(K, N) u32 -> (4*K, N*4) int8: rows (j, k) hold the int8 limbs i of
    (2^{7j} * W[k, n]) mod p at column n*4+i."""
    K, N = W.shape
    out = np.zeros((N_LIMBS, K, N, N_LIMBS), dtype=np.int8)
    for j in range(N_LIMBS):
        Wj = (W.astype(np.uint64) << (LIMB_BITS * j)) % p
        for i in range(N_LIMBS):
            out[j, :, :, i] = ((Wj >> (LIMB_BITS * i)) & 0x7F).astype(np.int8)
    return out.reshape(N_LIMBS * K, N * N_LIMBS)


class FourStepNtt:
    """Forward/inverse negacyclic NTT mod p for (..., d) u32 arrays."""

    def __init__(self, p: int, d: int):
        self.p, self.d = p, d
        self.ctx = mod_ctx(p)
        L = d.bit_length() - 1
        self.d1 = 1 << ((L + 1) // 2)
        self.d2 = d // self.d1
        d1, d2 = self.d1, self.d2

        g = primitive_root(p)
        psi = pow(g, (p - 1) // (2 * d), p)
        omega = pow(psi, 2, p)
        psi_inv = pow(psi, p - 2, p)
        omega_inv = pow(omega, p - 2, p)
        d1_inv = pow(d1, p - 2, p)
        d2_inv = pow(d2, p - 2, p)

        def powmat(base, rows, cols):
            e = np.outer(np.arange(rows, dtype=object),
                         np.arange(cols, dtype=object))
            return np.vectorize(lambda x: pow(base, int(x), p),
                                otypes=[np.uint64])(e)

        # forward, twist folded in:
        #   W1f[a, c] = (w^{d2})^{ac} * psi^{d2 a}
        #   Tf[b, c]  = w^{bc} * psi^b
        #   W2f[b, e] = (w^{d1})^{be}
        w1 = powmat(pow(omega, d2, p), d1, d1)
        psi_a = np.array([pow(psi, d2 * a, p) for a in range(d1)],
                         dtype=object)
        W1f = ((w1 * psi_a[:, None]) % p).astype(np.uint32)
        Tf = powmat(omega, d2, d1)
        psi_b = np.array([pow(psi, b, p) for b in range(d2)], dtype=object)
        Tf = ((Tf * psi_b[:, None]) % p).astype(np.uint32)
        W2f = powmat(pow(omega, d1, p), d2, d2).astype(np.uint32)

        self.W1f = _prescaled_matrix_limbs(W1f, p)
        self.W2f = _prescaled_matrix_limbs(W2f, p)
        self.Tf = Tf
        self.Tf_shoup = self.ctx.shoup(Tf)

        # inverse, untwist + 1/d folded in:
        #   W2i[e, b] = (1/d2) (w^{-d1})^{eb}
        #   Ti[b, c]  = w^{-bc} * psi^{-b}
        #   W1i[c, a] = (1/d1) (w^{-d2})^{ca} * psi^{-d2 a}
        W2i = ((powmat(pow(omega_inv, d1, p), d2, d2) * d2_inv) % p
               ).astype(np.uint32)
        Ti = powmat(omega_inv, d2, d1)
        psi_b_inv = np.array([pow(psi_inv, b, p) for b in range(d2)],
                             dtype=object)
        Ti = ((Ti * psi_b_inv[:, None]) % p).astype(np.uint32)
        w1i = powmat(pow(omega_inv, d2, p), d1, d1) * d1_inv % p
        psi_a_inv = np.array([pow(psi_inv, d2 * a, p) for a in range(d1)],
                             dtype=object)
        W1i = ((w1i * psi_a_inv[None, :]) % p).astype(np.uint32)

        self.W2i = _prescaled_matrix_limbs(W2i, p)
        self.W1i = _prescaled_matrix_limbs(W1i, p)
        self.Ti = Ti
        self.Ti_shoup = self.ctx.shoup(Ti)

        # recombination weights 2^{7i} mod p with shoup companions
        ws = np.array([(1 << (LIMB_BITS * i)) % p for i in range(N_LIMBS)],
                      dtype=np.uint64)
        self._rw = ws.astype(np.uint32)
        self._rw_shoup = self.ctx.shoup(ws)

    def _mm(self, x, Wl, contract_axis):
        """x: (..., A, B) u32; contract the given axis with the prescaled
        limb matrix Wl (4K, N*4); returns (..., other, N) u32 mod p."""
        xl = _limbs_i8(x)                     # (..., A, 4, B)
        if contract_axis == -2:
            xl = jnp.moveaxis(xl, -3, -1)     # (..., 4, B, A)
            xl = jnp.moveaxis(xl, -3, -2)     # (..., B, 4, A)
        K = xl.shape[-1]
        xl = xl.reshape(xl.shape[:-2] + (N_LIMBS * K,))
        out = jax.lax.dot_general(
            xl, jnp.asarray(Wl),
            dimension_numbers=(((xl.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)  # (..., X, N*4)
        N = Wl.shape[1] // N_LIMBS
        v = out.reshape(out.shape[:-1] + (N, N_LIMBS))
        # pair adjacent limbs in s32 first: o_i <= 4K*127^2 (K <= 64), so
        # o_0 + o_1*2^7 < 2^31 — two Barrett passes instead of four
        s01 = v[..., 0] + (v[..., 1] << 7)
        s23 = v[..., 2] + (v[..., 3] << 7)
        r01 = self.ctx.reduce_u32(s01.astype(jnp.uint32))
        r23 = self.ctx.reduce_u32(s23.astype(jnp.uint32))
        r23 = self.ctx.mul_shoup(r23, jnp.uint32(int(self._rw[2])),
                                 jnp.uint32(int(self._rw_shoup[2])))
        return self.ctx.add(r01, r23)

    def forward(self, x):
        d1, d2 = self.d1, self.d2
        v = x.reshape(x.shape[:-1] + (d1, d2))    # [a, b]
        y = self._mm(v, self.W1f, contract_axis=-2)   # (..., b, c)
        y = self.ctx.mul_shoup(y, jnp.asarray(self.Tf),
                               jnp.asarray(self.Tf_shoup))
        z = jnp.swapaxes(y, -1, -2)               # (..., c, b)
        z = self._mm(z, self.W2f, contract_axis=-1)   # (..., c, e)
        return z.reshape(x.shape[:-1] + (self.d,))

    def inverse(self, x):
        d1, d2 = self.d1, self.d2
        v = x.reshape(x.shape[:-1] + (d1, d2))    # [c, e]
        y = self._mm(v, self.W2i, contract_axis=-1)  # (..., c, b)
        y = jnp.swapaxes(y, -1, -2)               # (..., b, c)
        y = self.ctx.mul_shoup(y, jnp.asarray(self.Ti),
                               jnp.asarray(self.Ti_shoup))
        z = self._mm(y, self.W1i, contract_axis=-1)  # (..., b, a)
        z = jnp.swapaxes(z, -1, -2)               # (..., a, b)
        return z.reshape(x.shape[:-1] + (self.d,))


class CrtNttMxu:
    """Drop-in replacement for arith.ntt.CrtNtt using the MXU four-step."""

    def __init__(self, d: int):
        self.d = d
        self.np_ = FourStepNtt(P_I, d)
        self.nb_ = FourStepNtt(B_I, d)
        self.forward = jax.jit(self._forward)
        self.inverse = jax.jit(self._inverse)

    def _forward(self, x):
        return jnp.stack([self.np_.forward(x[..., 0, :]),
                          self.nb_.forward(x[..., 1, :])], axis=-2)

    def _inverse(self, x):
        return jnp.stack([self.np_.inverse(x[..., 0, :]),
                          self.nb_.inverse(x[..., 1, :])], axis=-2)


@lru_cache(maxsize=None)
def crt_ntt_mxu(d: int) -> CrtNttMxu:
    return CrtNttMxu(d)
