"""Batched negacyclic NTT over u32 lanes.

TPU-native counterpart of the reference's hand-written Harvey-butterfly
NTT (ref: src/core.cpp:247-514).  Instead of in-place strided butterflies,
each stage is a reshape + elementwise butterfly over a trailing split axis
(Stockham-style, no bit-reversal permutations, no gathers), which XLA maps
onto the VPU for an arbitrary leading batch.  The negacyclic wrap is
handled by a psi^i twist so all stages are plain cyclic radix-2.

All values stay canonical in [0, p); constant multiplies use Shoup
precomputation (same trick as ref: src/core.cpp:287-289).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..params import B_I, P_I
from .mod import mod_ctx
from .tables import NttTables, ntt_tables


def ntt_forward(x, tb: NttTables):
    """Negacyclic forward NTT over the last axis. x: u32 (..., d) in [0, p)."""
    ctx = mod_ctx(tb.p)
    d = tb.d
    L = d.bit_length() - 1
    x = ctx.mul_shoup(x, tb.twist, tb.twist_shoup)
    for s in range(L):
        t = d >> (s + 1)
        v = x.reshape(x.shape[:-1] + (1 << s, 2, t))
        l = v[..., 0, :]
        r = v[..., 1, :]
        nl = ctx.add(l, r)
        nr = ctx.mul_shoup(ctx.sub(l, r), tb.fwd_tw[s], tb.fwd_tw_shoup[s])
        x = jnp.stack([nl, nr], axis=-2).reshape(x.shape)
    return x


def ntt_inverse(x, tb: NttTables):
    """Inverse of ntt_forward (exact, canonical output in [0, p))."""
    ctx = mod_ctx(tb.p)
    d = tb.d
    L = d.bit_length() - 1
    for s in range(L - 1, -1, -1):
        t = d >> (s + 1)
        v = x.reshape(x.shape[:-1] + (1 << s, 2, t))
        a = v[..., 0, :]
        b = v[..., 1, :]
        bw = ctx.mul_shoup(b, tb.inv_tw[s], tb.inv_tw_shoup[s])
        nl = ctx.add(a, bw)
        nr = ctx.sub(a, bw)
        x = jnp.stack([nl, nr], axis=-2).reshape(x.shape)
    return ctx.mul_shoup(x, tb.untwist, tb.untwist_shoup)


class CrtNtt:
    """Both CRT limbs: transforms arrays shaped (..., 2, d).

    forward/inverse are jitted once per input shape; the tables are closed
    over so eager call sites pay a single compile instead of one per stage.
    """

    def __init__(self, d: int):
        self.d = d
        self.tb_p = ntt_tables(P_I, d)
        self.tb_b = ntt_tables(B_I, d)
        self.forward = jax.jit(self._forward)
        self.inverse = jax.jit(self._inverse)

    def _forward(self, x):
        return jnp.stack(
            [ntt_forward(x[..., 0, :], self.tb_p),
             ntt_forward(x[..., 1, :], self.tb_b)], axis=-2)

    def _inverse(self, x):
        return jnp.stack(
            [ntt_inverse(x[..., 0, :], self.tb_p),
             ntt_inverse(x[..., 1, :], self.tb_b)], axis=-2)


_crt_ntt_cache: dict[int, object] = {}

_ENGINES = ("mxu", "stockham", "pallas")
_pinned_engine: str | None = None


def set_engine(name: str | None) -> None:
    """Pin the NTT engine for this process (a deployment setting, not an
    auto-detect): engines use different self-consistent NTT-domain slot
    orders, so every party exchanging NTT-domain data (queries, DBs,
    public params) must pin the SAME engine — e.g. a CPU client talking
    to a TPU server pins 'mxu' on both sides, or 'pallas' if the client
    only ships coefficient-domain data.  Pass None to unpin (falls back
    to SPIRAL_NTT env or the backend default).  Must be called before
    any ring data is created for a given degree."""
    global _pinned_engine
    if name is not None and name not in _ENGINES:
        raise ValueError(f"unknown NTT engine {name!r}; one of {_ENGINES}")
    if _crt_ntt_cache and name != _pinned_engine:
        raise ValueError(
            "set_engine() after NTT engines were instantiated; pin the "
            "engine at process start, before creating ring data")
    _pinned_engine = name


def _resolve_engine(d: int) -> str:
    """Engine choice for ring degree d.  set_engine()/SPIRAL_NTT pin it;
    otherwise the fused Pallas kernel on TPU hardware at its supported
    degree (~2x the XLA four-step on v5e), the XLA four-step elsewhere."""
    import os
    engine = _pinned_engine or os.environ.get("SPIRAL_NTT")
    if engine is not None and engine not in _ENGINES:
        raise ValueError(f"unknown NTT engine {engine!r}; one of {_ENGINES}")
    if engine is None:
        import jax
        from .ntt_pallas import D1, D2
        engine = ("pallas" if d == D1 * D2 and
                  jax.default_backend() == "tpu" else "mxu")
    elif engine == "pallas":
        from .ntt_pallas import D1, D2
        if d != D1 * D2:
            engine = "mxu"
    return engine


def ntt_engine_name(d: int = 2048) -> str:
    """Engine id active for degree d; NTT-domain element order differs per
    engine, so serialized NTT-domain artifacts record and check it."""
    return _resolve_engine(d)


def crt_ntt(d: int):
    """Global NTT engine per ring degree (see _resolve_engine; set
    SPIRAL_NTT=mxu|stockham|pallas to override).  Engines use different
    (self-consistent) NTT-domain element orderings, so one engine must be
    used for all ring data of a given degree in a process — serialized
    artifacts carry the engine tag (serialize.py)."""
    if d not in _crt_ntt_cache:
        engine = _resolve_engine(d)
        if engine == "stockham":
            _crt_ntt_cache[d] = CrtNtt(d)
        elif engine == "pallas":
            from .ntt_pallas import CrtNttPallas
            _crt_ntt_cache[d] = CrtNttPallas(d)
        else:
            from .ntt_mxu import CrtNttMxu
            _crt_ntt_cache[d] = CrtNttMxu(d)
    return _crt_ntt_cache[d]
