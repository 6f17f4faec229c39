"""Secret keys (ref: src/client.cpp:23-46).

S = [Sp | I_n] with Sp an n x k gaussian (or ternary) matrix, plus the
scalar Regev secret sr.  The pack variant uses n = out_n, k = 1; the main
variant n = n0, k = n1 - n0.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..params import Params
from ..core.poly import PolyMat
from ..core.sampling import gaussian_residues, ternary_residues


@dataclasses.dataclass
class SecretKeys:
    S: PolyMat          # n x (k+n), coeff
    Sp: PolyMat         # n x k, coeff
    sr: PolyMat         # 1 x 1, coeff
    Sp_centered: np.ndarray  # host int64 (n, k, d) centered small values
    sr_centered: np.ndarray  # host int64 (d,)


def _sample_small(key, shape, ternary: bool, nonoise: bool):
    if nonoise:
        return jnp.zeros(shape[:-1] + (2,) + shape[-1:], dtype=jnp.uint32)
    if ternary:
        return ternary_residues(key, shape)
    return gaussian_residues(key, shape)


def keygen(params: Params, key, n_val: int | None = None, k: int | None = None,
           nonoise: bool = False) -> SecretKeys:
    n = params.n0 if n_val is None else n_val
    k = params.k_param if k is None else k
    d = params.poly_len
    k1, k2 = jax.random.split(key)
    sp = _sample_small(k1, (n, k, d), params.ternary, nonoise)
    sr = _sample_small(k2, (1, 1, d), params.ternary, nonoise)
    Sp = PolyMat(sp, ntt=False)
    sr_pm = PolyMat(sr, ntt=False)
    ident = PolyMat.from_host(
        np.eye(n, dtype=object)[:, :, None]
        * np.array([1] + [0] * (d - 1), dtype=object))
    S = PolyMat.hstack(Sp, ident)
    return SecretKeys(
        S=S, Sp=Sp, sr=sr_pm,
        Sp_centered=Sp.to_host_centered().astype(np.int64),
        sr_centered=sr_pm.to_host_centered().astype(np.int64)[0, 0],
    )


def sk_vec(keys: SecretKeys, d: int) -> PolyMat:
    """[sr, 1] row vector (ref: client.cpp:263-269 getSkVec)."""
    one = PolyMat.single(1, d)
    return PolyMat.hstack(keys.sr, one)
