"""Fused fold-round Pallas mega-kernel.

One GSW fold round (ref: src/spiral.cpp:1349-1410 foldOneFurtherDimension
+ split_and_crt + cpu_mul_query_by_ct) is a chain of five tensor ops in
the unfused path (server/fold.py): signed gadget decomposition, forward
NTT of the digit tensor, two external-product matmuls, add, inverse NTT.
The digit tensor is t_gsw times larger than the ciphertexts (round 0 at
the paper's 2^20 x 256 B shape: ~113 MB), so the unfused chain pays four
HBM round trips over it.  This kernel keeps the digits entirely in VMEM:

  grid = (m_out, 2); step (i, s) processes source ct 2i+s
    1. signed gadget decomposition (core/gadget.py impl, traced in-kernel)
    2. forward NTT of the m2*n2 digit polys (arith/ntt_pallas bodies)
    3. external-product matmul against q_neg (s=0) / q_pos (s=1)
    4. accumulate into a VMEM scratch across the two sources
    5. on s=1: inverse NTT of the n1*n2 sums -> output ct i

Only the (small) ciphertext tensors ever touch HBM; per-round traffic
drops from ~4x the digit tensor to ~1.5x the ct tensor.  Valid only when
the process NTT engine is the Pallas four-step engine (the query's
NTT-domain slot order must match the in-kernel transform); the fold.py
dispatcher enforces that.

Bit-identical to the unfused path (tests/test_fold_pallas.py): the digit
math and matmul reuse the same u32 building blocks.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import B_I, P_I, Params
from ..arith.mod import mod_ctx
from ..arith.ntt_pallas import (D1, D2, _fwd_body, _inv_body, _tables)
from ..core.gadget import gadget_invert_signed_impl

MODS = (P_I, B_I)


def _matmul_pair(a, b):
    """NTT-domain matmul on residue pairs, traced in-kernel.

    a: (R, M, 2, d), b: (M, C, 2, d) -> (R, C, 2, d).  Same 14-bit
    half-product scheme as core.poly.matmul_raw (which is jitted and so
    can't be called from inside a Mosaic kernel body).  Partial sums run
    in int32 (Mosaic has no unsigned reductions); chunk=8 keeps
    8*(2^14-1)^2 < 2^31 so the signed accumulator never wraps."""
    M = a.shape[-3]
    chunk = 8
    outs = []
    for li, p in enumerate(MODS):
        ctx = mod_ctx(p)
        A = a[..., li, :]   # (R, M, d)
        B = b[..., li, :]   # (M, C, d)
        A0, A1 = A & jnp.uint32(0x3FFF), A >> 14
        B0, B1 = B & jnp.uint32(0x3FFF), B >> 14
        acc = None
        for start in range(0, M, chunk):
            end = min(start + chunk, M)

            def psum(X, Y):
                # explicit slice/expand_dims: fancy indexing with a
                # newaxis lowers to a (unsupported >2D) gather in Mosaic
                xs = jnp.expand_dims(
                    jax.lax.slice_in_dim(X, start, end, axis=1), 2)
                ys = jnp.expand_dims(
                    jax.lax.slice_in_dim(Y, start, end, axis=0), 0)
                s = jnp.sum(xs.astype(jnp.int32) * ys.astype(jnp.int32),
                            axis=-3)
                return s.astype(jnp.uint32)

            p00 = ctx.reduce_u32(psum(A0, B0))
            p01 = ctx.reduce_u32(psum(A0, B1))
            p10 = ctx.reduce_u32(psum(A1, B0))
            p11 = ctx.reduce_u32(psum(A1, B1))
            mid = ctx.add(p01, p10)
            mid_r = ctx.reduce_pair(mid >> 18, mid << 14)
            hi_r = ctx.reduce_pair(p11 >> 4, p11 << 28)
            term = ctx.add(ctx.add(p00, mid_r), hi_r)
            acc = term if acc is None else ctx.add(acc, term)
        outs.append(acc)
    return jnp.stack(outs, axis=-2)


def _add_pair(a, b):
    outs = []
    for li, p in enumerate(MODS):
        outs.append(mod_ctx(p).add(a[..., li, :], b[..., li, :]))
    return jnp.stack(outs, axis=-2)


def _make_fold_kernel(t_gsw: int, n1: int, n2: int, d: int):
    tb_p, tb_b = _tables(P_I, d), _tables(B_I, d)
    m2 = t_gsw * n1

    def kernel(cts_ref, q_ref, f1, f2, f3, f4, i1, i2, i3, i4,
               out_ref, acc_ref):
        s = pl.program_id(1)
        ct = cts_ref[0, 0]                        # (n1, n2, 2, d)
        digs = gadget_invert_signed_impl(ct, t_gsw, n1)  # (m2, n2, 2, d)
        planes = []
        for li, tb in ((0, tb_p), (1, tb_b)):
            x = digs[..., li, :].reshape(m2 * n2, d)
            y = _fwd_body(tb, d, x, f1[li], f2[li], f3[li], f4[li])
            planes.append(y.reshape(m2, n2, d))
        g_ntt = jnp.stack(planes, axis=-2)        # (m2, n2, 2, d)
        prod = _matmul_pair(q_ref[0], g_ntt)      # (n1, n2, 2, d)

        @pl.when(s == 0)
        def _():
            acc_ref[...] = prod

        @pl.when(s == 1)
        def _():
            tot = _add_pair(acc_ref[...], prod)
            outs = []
            for li, tb in ((0, tb_p), (1, tb_b)):
                x = tot[..., li, :].reshape(n1 * n2, d)
                y = _inv_body(tb, d, x, i1[li], i2[li], i3[li], i4[li])
                outs.append(y.reshape(n1, n2, d))
            out_ref[0] = jnp.stack(outs, axis=-2)

    return kernel


@lru_cache(maxsize=None)
def _fold_tables(d: int):
    """Limb-stacked NTT tables (device arrays built lazily per process)."""
    import numpy as np
    tp, tb = _tables(P_I, d), _tables(B_I, d)
    fwd = (np.stack([tp.m1fT, tb.m1fT]), np.stack([tp.tf, tb.tf]),
           np.stack([tp.tf_shoup, tb.tf_shoup]), np.stack([tp.w2f, tb.w2f]))
    inv = (np.stack([tp.m1i, tb.m1i]), np.stack([tp.ti, tb.ti]),
           np.stack([tp.ti_shoup, tb.ti_shoup]), np.stack([tp.m2iT, tb.m2iT]))
    return fwd, inv


@lru_cache(maxsize=None)
def _fold_round_call(m_out: int, t_gsw: int, n1: int, n2: int, d: int,
                     interpret: bool):
    m2 = t_gsw * n1
    kernel = _make_fold_kernel(t_gsw, n1, n2, d)
    fwd, inv = _fold_tables(d)
    tabs = fwd + inv
    table_specs = [
        pl.BlockSpec(t.shape, lambda i, s, nd=t.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for t in tabs
    ]

    def run(cts_pairs, q_cat):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((m_out, n1, n2, 2, d),
                                           jnp.uint32),
            grid=(m_out, 2),
            in_specs=[
                pl.BlockSpec((1, 1, n1, n2, 2, d),
                             lambda i, s: (i, s, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n1, m2, 2, d),
                             lambda i, s: (s, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ] + table_specs,
            out_specs=pl.BlockSpec((1, n1, n2, 2, d),
                                   lambda i, s: (i, 0, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((n1, n2, 2, d), jnp.uint32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
            interpret=interpret,
        )(cts_pairs, q_cat, *[jnp.asarray(t) for t in tabs])

    return run


def fold_fused_supported(params: Params) -> bool:
    """The kernel requires the Pallas NTT engine's slot order (the query
    tensors are NTT-domain) and the engine's fixed ring degree."""
    from ..arith.ntt import ntt_engine_name
    return (params.poly_len == D1 * D2 and
            ntt_engine_name(params.poly_len) == "pallas")


def fold_rounds_fused(cts_coeff, q_pos, q_neg, params: Params,
                      start_round: int = 0, num_rounds: int | None = None,
                      interpret: bool | None = None):
    """Drop-in replacement for fold.fold_rounds via the fused kernel.

    cts_coeff: (m, n1, n2, 2, d) coeff domain, bit-reversed row order
    (round s pairs adjacent rows 2k/2k+1 — see server/fold.py)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    m = cts_coeff.shape[0]
    total = m.bit_length() - 1
    rounds = total if num_rounds is None else num_rounds
    p = params
    for r in range(start_round, start_round + rounds):
        m //= 2
        cts_pairs = cts_coeff.reshape((m, 2) + cts_coeff.shape[1:])
        q_cat = jnp.stack([q_neg[r], q_pos[r]])
        run = _fold_round_call(m, p.t_gsw, p.n1, p.n2, p.poly_len,
                               interpret)
        cts_coeff = run(cts_pairs, q_cat)
    return cts_coeff
