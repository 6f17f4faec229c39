"""Experimental four-step NTT formulations, benchmarked against the
production engine (arith/ntt_mxu.FourStepNtt) on real hardware.

Variant A: multi-axis dot_general — the data-limb axis and the K axis
contract together directly, and the output matrix-limb axis stays a real
axis; no moveaxis/swapaxes/reshape around the matmuls, so XLA is free to
pick layouts and fuse the recombination.

Variant B: A + twiddle folded into per-column step-2 matrices (batched
matmul over d1), removing the elementwise mulmod pass entirely.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/ntt_variants.py
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from spiral_tpu.params import P_I
from spiral_tpu.arith.mod import mod_ctx
from spiral_tpu.arith.ntt_mxu import (FourStepNtt, LIMB_BITS, N_LIMBS,
                                      _limbs_i8)


def _wl4(Wl: np.ndarray, K: int) -> np.ndarray:
    """(4K, N*4) prescaled limb matrix -> (4, K, N, 4) for multi-axis
    contraction."""
    N4 = Wl.shape[1]
    return Wl.reshape(N_LIMBS, K, N4 // N_LIMBS, N_LIMBS)


class VariantA(FourStepNtt):
    def __init__(self, p, d):
        super().__init__(p, d)
        self.W1f4 = _wl4(self.W1f, self.d1)
        self.W2f4 = _wl4(self.W2f, self.d2)

    def _mm4(self, x, Wl4, contract_axis):
        """x: (..., A, B); contract the given axis (value axis) together
        with the data-limb axis against Wl4 (4, K, N, 4)."""
        xl = _limbs_i8(x)                     # (..., A, 4, B)
        nd = xl.ndim
        if contract_axis == -2:               # contract A
            cdims = (nd - 3, nd - 2)
        else:                                 # contract B
            cdims = (nd - 1, nd - 2)
        out = jax.lax.dot_general(
            xl, jnp.asarray(Wl4),
            dimension_numbers=(((cdims[0], cdims[1]), (1, 0)), ((), ())),
            preferred_element_type=jnp.int32)  # (..., other, N, 4)
        v = out
        s01 = v[..., 0] + (v[..., 1] << 7)
        s23 = v[..., 2] + (v[..., 3] << 7)
        r01 = self.ctx.reduce_u32(s01.astype(jnp.uint32))
        r23 = self.ctx.reduce_u32(s23.astype(jnp.uint32))
        r23 = self.ctx.mul_shoup(r23, jnp.uint32(int(self._rw[2])),
                                 jnp.uint32(int(self._rw_shoup[2])))
        return self.ctx.add(r01, r23)

    def forward(self, x):
        d1, d2 = self.d1, self.d2
        v = x.reshape(x.shape[:-1] + (d1, d2))        # [a, b]
        y = self._mm4(v, self.W1f4, contract_axis=-2)  # (..., b, c)
        y = self.ctx.mul_shoup(y, jnp.asarray(self.Tf),
                               jnp.asarray(self.Tf_shoup))
        z = jnp.swapaxes(y, -1, -2)                   # (..., c, b)
        z = self._mm4(z, self.W2f4, contract_axis=-1)  # (..., c, e)
        return z.reshape(x.shape[:-1] + (self.d,))


class VariantB(VariantA):
    """Twiddle folded into step 2: per-c matrices W2T[c][b, e] =
    Tf[b, c] * W2f[b, e]; step 2 becomes a batched matmul over c."""

    def __init__(self, p, d):
        super().__init__(p, d)
        from spiral_tpu.arith.ntt_mxu import _prescaled_matrix_limbs
        # rebuild raw (unprescaled) W2f and Tf as ints
        d1, d2 = self.d1, self.d2
        # recover integer tables by re-deriving (cheap):
        from spiral_tpu.arith.tables import primitive_root
        g = primitive_root(p)
        psi = pow(g, (p - 1) // (2 * d), p)
        omega = pow(psi, 2, p)

        def powmat(base, rows, cols):
            e = np.outer(np.arange(rows, dtype=object),
                         np.arange(cols, dtype=object))
            return np.vectorize(lambda x: pow(base, int(x), p),
                                otypes=[np.uint64])(e)

        Tf = powmat(omega, d2, d1)
        psi_b = np.array([pow(psi, b, p) for b in range(d2)], dtype=object)
        Tf = ((Tf * psi_b[:, None]) % p)                       # (b, c)
        W2 = powmat(pow(omega, d1, p), d2, d2)                 # (b, e)
        # per-c prescaled limb matrices: (c, 4, K=d2, N=d2, 4)
        mats = np.zeros((d1, N_LIMBS, d2, d2, N_LIMBS), dtype=np.int8)
        for c in range(d1):
            M = ((Tf[:, c:c + 1] * W2) % p).astype(np.uint32)  # (b, e)
            mats[c] = _wl4(_prescaled_matrix_limbs(M, p), d2)
        self.W2T4 = mats

    def forward(self, x):
        d1, d2 = self.d1, self.d2
        v = x.reshape(x.shape[:-1] + (d1, d2))        # [a, b]
        y = self._mm4(v, self.W1f4, contract_axis=-2)  # (..., b, c)
        y = jnp.swapaxes(y, -1, -2)                   # (..., c, b)
        # batched matmul over c: contract (b, limb) per c
        xl = _limbs_i8(y)                             # (..., c, 4, b)
        nd = xl.ndim
        out = jax.lax.dot_general(
            xl, jnp.asarray(self.W2T4),
            dimension_numbers=(
                ((nd - 1, nd - 2), (2, 1)),           # contract b, limb
                ((nd - 3,), (0,))),                   # batch c
            preferred_element_type=jnp.int32)
        # out: (c, ..., e, 4) with batch dim leading
        v4 = jnp.moveaxis(out, 0, -3)                 # (..., c, e, 4)
        s01 = v4[..., 0] + (v4[..., 1] << 7)
        s23 = v4[..., 2] + (v4[..., 3] << 7)
        r01 = self.ctx.reduce_u32(s01.astype(jnp.uint32))
        r23 = self.ctx.reduce_u32(s23.astype(jnp.uint32))
        r23 = self.ctx.mul_shoup(r23, jnp.uint32(int(self._rw[2])),
                                 jnp.uint32(int(self._rw_shoup[2])))
        z = self.ctx.add(r01, r23)
        return z.reshape(x.shape[:-1] + (self.d,))


def bench(name, fn, x, reps=8, chain=8):
    @jax.jit
    def chained(x):
        y = x
        for _ in range(chain):
            y = fn(y) % jnp.uint32(P_I)
        return y[0, 0]

    float(chained(x))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(chained(x))
        best = min(best, time.perf_counter() - t0)
    best /= chain
    print(f"{name:10s} {best*1e3:8.3f} ms "
          f"({x.shape[0] / best / 1e6:.2f}M polys/s)")
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24576)
    ap.add_argument("--d", type=int, default=2048)
    args = ap.parse_args()
    print(f"devices: {jax.devices()}")

    base = FourStepNtt(P_I, args.d)
    va = VariantA(P_I, args.d)
    vb = VariantB(P_I, args.d)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, P_I, size=(args.batch, args.d),
                                 dtype=np.uint32))
    # correctness cross-check
    want = np.asarray(base.forward(x[:4]))
    for name, eng in (("A", va), ("B", vb)):
        got = np.asarray(eng.forward(x[:4]))
        assert np.array_equal(got, want), f"variant {name} mismatch"
    print("variants agree with production engine")

    bench("baseline", base.forward, x)
    bench("variantA", va.forward, x)
    bench("variantB", vb.forward, x)


if __name__ == "__main__":
    main()
