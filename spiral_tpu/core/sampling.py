"""Randomness: discrete gaussian, ternary, and uniform residue sampling.

Mirrors the reference's samplers (ref: src/core.cpp:182-207 gaussian table
of width 6.4, src/util.cpp:77-87 uniform) on jax.random (threefry) instead
of mt19937.  Uniform-mod-Q sampling draws each CRT residue independently,
which is exactly uniform over Z_Q by CRT.
"""
from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..params import B_I, P_I

GAUSS_WIDTH = 6.4
NUM_WIDTHS = 10
MAX_VAL = int(math.ceil(GAUSS_WIDTH * NUM_WIDTHS))  # 64


@lru_cache(maxsize=None)
def _gauss_logits() -> np.ndarray:
    # host numpy: safe to cache across jit traces
    i = np.arange(-MAX_VAL, MAX_VAL + 1, dtype=np.float64)
    logp = -math.pi * i ** 2 / GAUSS_WIDTH ** 2
    return logp.astype(np.float32)


def _small_to_residues(v):
    """Signed small ints (|v| <= 2^20ish) -> residue tensor (..., 2, d-last)."""
    neg = v < 0
    mag = jnp.abs(v).astype(jnp.uint32)
    limbs = []
    for p in (P_I, B_I):
        pp = jnp.uint32(p)
        r = jnp.where(neg, pp - mag, mag)
        r = jnp.where(r >= pp, r - pp, r)
        limbs.append(r)
    return jnp.stack(limbs, axis=-2)


def gaussian_residues(key, shape):
    """Discrete gaussian (width 6.4), as residue tensor shape+(2,) inserted
    before last axis: input shape (..., d) -> output (..., 2, d)."""
    v = jax.random.categorical(key, _gauss_logits(), shape=shape) - MAX_VAL
    return _small_to_residues(v)


def ternary_residues(key, shape):
    v = jax.random.randint(key, shape, 0, 3) - 1
    return _small_to_residues(v)


def uniform_residues(key, shape):
    """Uniform over Z_Q as independent uniform residues."""
    kp, kb = jax.random.split(key)
    x = jax.random.randint(kp, shape, 0, P_I, dtype=jnp.uint32)
    y = jax.random.randint(kb, shape, 0, B_I, dtype=jnp.uint32)
    return jnp.stack([x, y], axis=-2)
