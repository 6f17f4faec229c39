"""Fused Pallas packing kernel for the high-rate variants.

pack_ciphertexts (ref: src/testing.cpp:198-241 pack()) is, per trial
(r, c): unsigned gadget digits of the scalar ct's row 0, forward NTT of
those digits and of row 1, a key-switch matmul against the packing keys
v_W[r], and accumulation over r with the row-1 polys embedded at output
row 1 + r.  The unfused chain (pack.pack_ciphertexts) pays multiple
engine dispatches + HBM round trips on the digit tensor; here all
out_n^2 trials run in ONE kernel invocation with the digits resident in
VMEM.

The r-accumulation folds into the matmul contraction: with the packing
keys prearranged K-major as (digit k, trial-row r) — matching the
k-major digit rows over trials ordered (r, c) — the whole pack is one
(out_n+1) x (m_conv*out_n) per-slot contraction over out_n*d lanes.

Bit-identical to pack.pack_ciphertexts (tests/test_e2e_pack.py +
tests/test_pack_pallas.py); valid only under the Pallas NTT engine
(slot orders differ between engines)."""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import B_I, P_I, get_bits_per
from ..arith.mod import mod_ctx
from .fold_pallas import (_fold_tables, _fwd_tiled, _fwd_tiled_i8,
                          _matmul_limb_2d)
from ..arith.ntt_pallas import _tables

MODS = (P_I, B_I)


def _pack_digit_mode(m_conv: int) -> tuple[str, int]:
    bits = get_bits_per(m_conv)
    if bits <= 7:
        return "i8", 0
    if bits == 8:
        return "i8", 128
    return "2d", 0


def _make_pack_kernel(out_n: int, m_conv: int, d: int):
    from .expand_pallas import (_unsigned_digit_rows_2d,
                                _unsigned_digit_rows_i8)
    tb_p, tb_b = _tables(P_I, d), _tables(B_I, d)
    T = out_n * out_n
    kind, bias = _pack_digit_mode(m_conv)
    has_corr = bias > 0

    def kernel(cts_ref, a_ref, f1, f2, f3, f4, *rest):
        out_ref = rest[-1]
        corr_ref = rest[0] if has_corr else None
        ct = cts_ref[...]                     # (T, 2, 2, d)
        fwd = (f1, f2, f3, f4)
        if kind == "i8":
            rows8 = _unsigned_digit_rows_i8(ct[:, 0, 0, :], ct[:, 0, 1, :],
                                            m_conv, bias)
            rp = rb = None
        else:
            rp, rb = _unsigned_digit_rows_2d(ct[:, 0, 0, :], ct[:, 0, 1, :],
                                             m_conv)
        planes = []
        for li, tb, rows in ((0, tb_p, rp), (1, tb_b, rb)):
            ctx = mod_ctx(MODS[li])
            tabs_l = [t[li] for t in fwd]
            if kind == "i8":
                dig = _fwd_tiled_i8(tb, d, rows8, tabs_l)
            else:
                dig = _fwd_tiled(tb, d, rows, tabs_l)
            ct2 = _fwd_tiled(tb, d, ct[:, 1, li, :], tabs_l)  # (T, d)
            # digit rows are (k, r, c)-major; flattening (k, r) into the
            # contraction matches a_ref's K order (see pack_fused)
            B = dig.reshape(m_conv * out_n, out_n * d)
            prod = _matmul_limb_2d(a_ref[:, :, li, :], B, ctx)
            if has_corr:
                prod = ctx.add(prod, corr_ref[:, li, :][:, None, :])
            v = prod.reshape(out_n + 1, out_n, d)
            e = ct2.reshape(out_n, out_n, d)
            rows_out = [v[0:1]]
            for r in range(out_n):
                rows_out.append(ctx.add(v[1 + r:2 + r], e[r:r + 1]))
            planes.append(jnp.concatenate(rows_out, axis=0))
        out_ref[...] = jnp.stack(planes, axis=-2)   # (on+1, on, 2, d)

    return kernel


@lru_cache(maxsize=None)
def _pack_call(out_n: int, m_conv: int, d: int, interpret: bool):
    T = out_n * out_n
    kernel = _make_pack_kernel(out_n, m_conv, d)
    fwd, _ = _fold_tables(d)
    _, bias = _pack_digit_mode(m_conv)
    table_specs = [
        pl.BlockSpec(t.shape, lambda nd=t.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for t in fwd
    ]
    extra_specs = []
    if bias:
        extra_specs.append(pl.BlockSpec((out_n + 1, 2, d),
                                        lambda: (0, 0, 0),
                                        memory_space=pltpu.VMEM))

    def run(cts, a_pre, corr=None):
        extra = [corr] if bias else []
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((out_n + 1, out_n, 2, d),
                                           jnp.uint32),
            in_specs=[
                pl.BlockSpec((T, 2, 2, d), lambda: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((out_n + 1, m_conv * out_n, 2, d),
                             lambda: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ] + table_specs + extra_specs,
            out_specs=pl.BlockSpec((out_n + 1, out_n, 2, d),
                                   lambda: (0, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(cts, a_pre, *[jnp.asarray(t) for t in fwd], *extra)

    return run


def pack_fused_supported(params) -> bool:
    from .fold_pallas import fold_fused_supported
    # wide packing gadgets (m_conv*out_n > 64 contraction terms, e.g.
    # streampack m_conv=56/out_n=4) exceed the VMEM budget at d=2048;
    # the unfused chain serves those (measured r5)
    return (fold_fused_supported(params) and
            params.m_conv * params.out_n <= 64)


def pack_ciphertexts_fused(result_cts, v_W, params,
                           interpret: bool | None = None):
    """Fused pack (pack.pack_ciphertexts semantics, bit-identical).

    result_cts: (T=out_n^2, 2, 1, 2, d) coeff, trial (r, c) at r*out_n+c;
    v_W: (out_n, out_n+1, m_conv, 2, d) NTT (Pallas engine order).
    Returns (out_n+1, out_n, 2, d) NTT."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out_n, m_conv, d = params.out_n, params.m_conv, params.poly_len
    # packing keys K-major as (k, r): A[b, k*out_n + r] = v_W[r, b, k]
    a_pre = v_W.transpose(1, 2, 0, 3, 4).reshape(
        out_n + 1, m_conv * out_n, 2, d)
    _, bias = _pack_digit_mode(m_conv)
    corr = None
    if bias:
        from .expand_pallas import w_bias_corr
        corr = w_bias_corr(a_pre, m_conv * out_n, bias)
    run = _pack_call(out_n, m_conv, d, interpret)
    cts = result_cts.reshape(out_n * out_n, 2, 2, d)
    return run(cts, a_pre, corr)
