"""Automorphism-based coefficient expansion.

TPU-native re-design of expandImproved / coefficientExpansion
(ref: src/spiral.cpp:1664-1743, src/testing.cpp:40-105).  The reference
walks ciphertexts one at a time; here every round processes the whole
surviving batch at once: one batched inverse NTT, one gather
(automorphism), one batched gadget decomposition + NTT, and one batched
key-switch matmul for each of the two gadget widths (first-dim slots use
W_left/m_exp on even indices, GSW slots W_right/m_exp_right on odd).

Round r maps 2^r cts -> 2^{r+1} via
  cv[num_in + i] = x^{-2^r} * cv[i]
  cv[i] += KeySwitch_W(tau_t(cv[i])),  t = d/2^r + 1.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..params import Params
from ..arith.ntt import crt_ntt
from ..core.poly import (PolyMat, add_raw, automorph_raw, matmul_raw,
                         scalar_mul_raw)
from ..core.gadget import gadget_invert_raw


def _neg_monomial_ntt(r: int, d: int, eng=None) -> jnp.ndarray:
    """NTT of x^{-2^r} = -x^{d - 2^r} (ref: spiral.cpp:184-192).

    `eng` overrides the global engine (the fused path requires the
    Pallas slot order regardless of the process default)."""
    pm = PolyMat.monomial(-1, d - (1 << r), d)
    if eng is None:
        return pm.to_ntt().data[0, 0]
    return eng.forward(pm.data)[0, 0]


def _keyswitch_batch(cv, W, m_exp: int, t: int, eng):
    """One expansion update for a batch of cts.

    cv: (N, base, 1, 2, d) NTT.  W: (base, m_exp, 2, d) NTT.
    Returns cv + KeySwitch(tau_t(cv)).
    """
    c = eng.inverse(cv)
    c_auto = automorph_raw(c, t)
    c0 = c_auto[:, 0:1]                       # (N, 1, 1, 2, d)
    c1_ntt = eng.forward(c_auto[:, 1:2])      # (N, 1, 1, 2, d)
    ginv = gadget_invert_raw(c0, m_exp, 1)    # (N, m_exp, 1, 2, d)
    ginv_ntt = eng.forward(ginv)
    w_prod = matmul_raw(W, ginv_ntt)          # (N, base, 1, 2, d)
    out = add_raw(cv, w_prod)
    # add tau(c)_1 to the bottom row only (ref: spiral.cpp:1728-1737)
    base = cv.shape[1]
    bottom = add_raw(out[:, base - 1:base], c1_ntt)
    return jnp.concatenate([out[:, :base - 1], bottom], axis=1)


def _keyswitch_round_both(evens, odds, W_l, W_r, m_l: int, m_r: int,
                          t: int, eng, d: int):
    """One expansion round updating even AND odd slots with their
    respective gadget widths, with all NTT work merged: one batched
    inverse over every surviving ct and ONE batched forward over every
    tau(c)_1 poly + every gadget digit of both widths (the early rounds
    have tiny batches, so launch count and batch size dominate)."""
    Ne, No = evens.shape[0], odds.shape[0]
    base = evens.shape[1]
    cv_all = jnp.concatenate([evens, odds], axis=0)
    c = eng.inverse(cv_all)
    c_auto = automorph_raw(c, t)
    ginv_e = gadget_invert_raw(c_auto[:Ne, 0:1], m_l, 1)   # (Ne, m_l, 1,..)
    ginv_o = gadget_invert_raw(c_auto[Ne:, 0:1], m_r, 1)
    flat = jnp.concatenate([
        c_auto[:, 1, 0],                          # tau(c)_1 polys (N)
        ginv_e.reshape(Ne * m_l, 2, d),
        ginv_o.reshape(No * m_r, 2, d),
    ], axis=0)
    f = eng.forward(flat)
    c1_ntt = f[:Ne + No].reshape(Ne + No, 1, 1, 2, d)
    ge = f[Ne + No:Ne + No + Ne * m_l].reshape(Ne, m_l, 1, 2, d)
    go = f[Ne + No + Ne * m_l:].reshape(No, m_r, 1, 2, d)

    def finish(cv, w_prod, c1):
        out = add_raw(cv, w_prod)
        bottom = add_raw(out[:, base - 1:base], c1)
        return jnp.concatenate([out[:, :base - 1], bottom], axis=1)

    new_e = finish(evens, matmul_raw(W_l, ge), c1_ntt[:Ne])
    new_o = finish(odds, matmul_raw(W_r, go), c1_ntt[Ne:])
    return new_e, new_o


def _fused_enabled(d: int) -> bool:
    """Fused Pallas expansion rounds (server/expand_pallas.py): on by
    default on TPU under the Pallas NTT engine; SPIRAL_EXPAND=fused/xla
    forces."""
    import os
    import jax
    mode = os.environ.get("SPIRAL_EXPAND", "")
    if mode == "xla":
        return False
    from ..arith.ntt import ntt_engine_name
    from ..arith.ntt_pallas import D1, D2
    if d != D1 * D2 or ntt_engine_name(d) != "pallas":
        return False
    return mode == "fused" or jax.default_backend() == "tpu"


def coefficient_expansion(cv0, g: int, W_left_v, W_right_v, params: Params,
                          max_bits_to_gen_right: int = 0, stopround: int = 0,
                          fused: bool | None = None):
    """Expand one ct into 2^g cts.

    cv0: (base, 1, 2, d) NTT.  W_left_v/W_right_v: lists of (base, m, 2, d).
    Returns (2^g, base, 1, 2, d).  Skip rules mirror the reference: with
    stopround > 0, odd slots stop expanding after round `stopround`.

    fused=None auto-selects the Pallas mega-kernel path (see
    _fused_enabled); callers that vmap this function pass fused=False.
    """
    d = params.poly_len
    if fused is None:
        fused = _fused_enabled(d)
    if fused:
        import jax
        from ..arith.ntt_pallas import crt_ntt_pallas
        from .expand_pallas import inv_ntt_automorph, keyswitch_fused
        interpret = jax.default_backend() != "tpu"
        eng = crt_ntt_pallas(d)   # fused kernels fix the slot order
    else:
        eng = crt_ntt(d)
    cv = cv0[None]  # (1, base, 1, 2, d)
    for r in range(g):
        t = (d >> r) + 1
        neg1 = _neg_monomial_ntt(r, d, eng if fused else None)
        cv = jnp.concatenate([cv, scalar_mul_raw(neg1, cv)], axis=0)
        num_out = cv.shape[0]

        evens = cv[0::2]
        odds = cv[1::2]
        if stopround == 0 or r <= stopround:
            if fused:
                c_auto = inv_ntt_automorph(cv, t, interpret)
                new_evens = keyswitch_fused(evens, c_auto[0::2],
                                            W_left_v[r], params.m_exp,
                                            interpret)
                new_odds = keyswitch_fused(odds, c_auto[1::2],
                                           W_right_v[r],
                                           params.m_exp_right, interpret)
            else:
                new_evens, new_odds = _keyswitch_round_both(
                    evens, odds, W_left_v[r], W_right_v[r], params.m_exp,
                    params.m_exp_right, t, eng, d)
            if stopround > 0 and r == stopround:
                # odd slot i (ct index 2i+1) only needed for i <= max_bits
                keep = (jnp.arange(odds.shape[0]) <= max_bits_to_gen_right)
                new_odds = jnp.where(
                    keep[:, None, None, None, None], new_odds, odds)
        else:
            if fused:
                c_auto_e = inv_ntt_automorph(evens, t, interpret)
                new_evens = keyswitch_fused(evens, c_auto_e, W_left_v[r],
                                            params.m_exp, interpret)
            else:
                new_evens = _keyswitch_batch(evens, W_left_v[r],
                                             params.m_exp, t, eng)
            new_odds = odds
        cv = jnp.stack([new_evens, new_odds], axis=1).reshape(
            (num_out,) + cv.shape[1:])
    return cv


def reorder_from_stopround(cv, even_count: int, odd_count: int):
    """Evens first then odds (ref: spiral.cpp:2027-2036)."""
    return jnp.concatenate([cv[0::2][:even_count], cv[1::2][:odd_count]],
                           axis=0)
