"""Four-step negacyclic NTT on the MXU.

The d-point cyclic NTT factorises as d = d1*d2:
    X[d1*e + c] = sum_b (w^{d1})^{be} * w^{bc} * [sum_a (w^{d2})^{ac} x[d2*a+b]]
i.e. a d1-point DFT along one axis (matmul), an elementwise twiddle, and a
d2-point DFT along the other (matmul).  Operands are 28-bit residues split
into four 7-bit int8 limbs so both matmuls run exactly on the MXU with
int32 accumulation (products <= 127^2, K <= 64 summands, limb-pair
recombination < 2^26).  This replaces the reference's Harvey butterfly
network (ref: src/core.cpp:247-514) with two dense matmuls — the shape
the MXU systolic array is built for — instead of 11 strided butterfly
stages.

The NTT-domain evaluation ordering differs from arith/ntt.py's Stockham
order; both are valid pointwise conventions.  One engine must be used
consistently for all ring data (crt_ntt() picks the engine globally).
"""
from __future__ import annotations

import math
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
    """u32 (..., K) -> int8 (..., 4, K) limb planes."""
    parts = [((v >> (LIMB_BITS * j)) & jnp.uint32(0x7F)).astype(jnp.int8)
             for j in range(N_LIMBS)]
    return jnp.stack(parts, axis=-2)


def _matrix_limbs(W: np.ndarray) -> np.ndarray:
    """(K, N) u32 matrix -> (K, N*4) int8 with limb i at column n*4+i."""
    K, N = W.shape
    out = np.zeros((K, N, N_LIMBS), dtype=np.int8)
    for i in range(N_LIMBS):
        out[:, :, i] = ((W >> (LIMB_BITS * i)) & 0x7F).astype(np.int8)
    return out.reshape(K, N * N_LIMBS)


def _recombine(out_s32, p: int, N: int):
    """(..., 4j, N*4i) s32 limb-pair products -> (..., N) u32 mod p."""
    ctx = mod_ctx(p)
    v = out_s32.reshape(out_s32.shape[:-2] + (N_LIMBS, N, N_LIMBS))
    acc = None
    for s in range(2 * N_LIMBS - 1):
        terms = [v[..., i, :, s - i]
                 for i in range(max(0, s - N_LIMBS + 1), min(N_LIMBS, s + 1))]
        S = terms[0]
        for t in terms[1:]:
            S = S + t
        r = ctx.reduce_u32(S.astype(jnp.uint32))
        w = (1 << (LIMB_BITS * s)) % p
        ws = (w << 32) // p
        r = ctx.mul_shoup(r, jnp.uint32(w), jnp.uint32(ws))
        acc = r if acc is None else ctx.add(acc, r)
    return acc


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
            e = (np.outer(np.arange(rows, dtype=object),
                          np.arange(cols, dtype=object)))
            return np.vectorize(lambda x: pow(base, int(x), p),
                                otypes=[np.uint64])(e).astype(np.uint32)

        # forward: W1[a, c] = (w^{d2})^{ac}; T[b, c] = w^{bc};
        #          W2[b, e] = (w^{d1})^{be}
        self.W1 = _matrix_limbs(powmat(pow(omega, d2, p), d1, d1))
        self.W2 = _matrix_limbs(powmat(pow(omega, d1, p), d2, d2))
        T = powmat(omega, d2, d1)                 # (b, c)
        self.T = T
        self.T_shoup = self.ctx.shoup(T)

        # inverse matrices carry the 1/d1, 1/d2 scales
        W1i = powmat(pow(omega_inv, d2, p), d1, d1).astype(np.uint64)
        W1i = ((W1i * d1_inv) % p).astype(np.uint32)
        W2i = powmat(pow(omega_inv, d1, p), d2, d2).astype(np.uint64)
        W2i = ((W2i * d2_inv) % p).astype(np.uint32)
        self.W1i = _matrix_limbs(W1i)
        self.W2i = _matrix_limbs(W2i)
        Ti = powmat(omega_inv, d2, d1)
        self.Ti = Ti
        self.Ti_shoup = self.ctx.shoup(Ti)

        twist = np.array([pow(psi, i, p) for i in range(d)], dtype=np.uint64)
        untwist = np.array([pow(psi_inv, i, p) for i in range(d)],
                           dtype=np.uint64)
        self.twist = twist.astype(np.uint32)
        self.twist_shoup = self.ctx.shoup(twist)
        self.untwist = untwist.astype(np.uint32)
        self.untwist_shoup = self.ctx.shoup(untwist)

    def _mm(self, x, Wl, contract_axis):
        """x: (..., A, B) u32; contract the given axis (-1 or -2) with the
        limb matrix Wl (K, N*4); returns (..., other, N) u32 mod p."""
        xl = _limbs_i8(x)                     # (..., A, 4, B)? no:
        # _limbs_i8 stacks on axis -2 giving (..., A, 4, B); we want limb
        # axis free and contract axis last
        if contract_axis == -2:
            # contract A: move to last: (..., B, 4, A)
            xl = jnp.moveaxis(xl, -3, -1)     # (..., 4, B, A)
            xl = jnp.moveaxis(xl, -3, -2)     # (..., B, 4, A)
        out = jax.lax.dot_general(
            xl, jnp.asarray(Wl),
            dimension_numbers=(((xl.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)  # (..., X, 4, N*4)
        N = Wl.shape[1] // N_LIMBS
        return _recombine(out, self.p, N)      # (..., X, N)

    def forward(self, x):
        d1, d2 = self.d1, self.d2
        x = self.ctx.mul_shoup(x, jnp.asarray(self.twist),
                               jnp.asarray(self.twist_shoup))
        v = x.reshape(x.shape[:-1] + (d1, d2))    # [a, b]
        y = self._mm(v, self.W1, contract_axis=-2)   # (..., b, c)
        y = self.ctx.mul_shoup(y, jnp.asarray(self.T),
                               jnp.asarray(self.T_shoup))
        z = jnp.swapaxes(y, -1, -2)               # (..., c, b)
        z = self._mm(z, self.W2, contract_axis=-1)   # (..., c, e)
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
        z = z.reshape(x.shape[:-1] + (self.d,))
        return self.ctx.mul_shoup(z, jnp.asarray(self.untwist),
                                  jnp.asarray(self.untwist_shoup))


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
