"""Multi-device sharding of the server pipeline.

The reference is single-core (ref: src/spiral.cpp:1231); scale-out here is
TPU-native (SURVEY.md §2.7).  Two layouts:

* **Row sharding (production default)** — the first-dimension database is
  split over the `num_per` output rows across a 1-D device mesh.  The
  first-dim multiply (the database-streaming, rate-limiting kernel,
  ref: src/spiral.cpp:628-999) then needs ZERO collectives: every device
  streams only its DB shard and produces its slice of the `num_per`
  outputs.  The early folding rounds stay sharded too (they are batched
  over surviving cts); XLA SPMD inserts the tiny ct exchanges as the
  count drops below the mesh size.  `SpiralServer(..., mesh=...)` /
  `PackServer(..., mesh=...)` use this.

* **Contraction sharding (psum)** — the contraction axis K = dim0*n0 is
  split; each device computes partial n1 x n2 inner products over its DB
  shard and a modular psum reduces them.  Used when num_per is too small
  to split (e.g. stream-variant shapes with huge dim0).

Expansion/conversion operate on query-sized data (KBs) and run
replicated either way.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

shard_map = jax.shard_map

from ..params import B_I, P_I, Params
from ..arith.mod import mod_ctx
from ..arith.ntt import crt_ntt
from ..server.fold import fold_ciphertexts


def make_db_mesh(devices=None, name: str = "db") -> Mesh:
    devices = jax.devices() if devices is None else devices
    return jax.make_mesh((len(devices),), (name,), devices=devices)


def psum_mod(x, p: int, axis_name: str):
    """Exact modular psum of canonical u32 residues (< p < 2^28).

    jax.lax.psum is an integer sum, so summing canonical residues would
    overflow u32 beyond 16 devices.  Splitting each residue into 16-bit
    halves keeps both partial sums inside u32 for up to 2^16 devices:
    lo-sum < N*2^16, hi-sum < N*2^12 (residues < 2^28)."""
    lo = jax.lax.psum(x & jnp.uint32(0xFFFF), axis_name)
    hi = jax.lax.psum(x >> jnp.uint32(16), axis_name)
    ctx = mod_ctx(p)
    w = (1 << 16) % p
    ws = (w << 32) // p
    return ctx.add(ctx.mul_shoup(ctx.reduce_u32(hi), jnp.uint32(w),
                                 jnp.uint32(ws)),
                   ctx.reduce_u32(lo))


def psum_mod_pair(x, axis_name: str):
    """Modular psum over the CRT pair; x: (..., 2, d) canonical residues."""
    return jnp.stack([psum_mod(x[..., 0, :], P_I, axis_name),
                      psum_mod(x[..., 1, :], B_I, axis_name)], axis=-2)


# ---------------------------------------------------------------------------
# Row sharding (production): helpers used by SpiralServer/PackServer

def row_shard_spec(mesh: Mesh):
    """NamedSharding for a ROW-MAJOR MXU limb DB (2, d, K, num_per*n2*4).

    LAYOUT CONTRACT: only tensors built with
    ``db_to_mxu_limbs(..., row_major=True)`` may be sharded with this
    spec.  The default (limb-major) layout has the same shape but orders
    the trailing axis (limb, row); splitting THAT over the mesh would put
    whole limb planes on different devices and silently scramble the
    output.  The layouts are indistinguishable from shape alone, so this
    is enforced by construction at the two call sites (pir.py, pack.py),
    both of which pass row_major=True."""
    return NamedSharding(mesh, P(None, None, None, "db"))


def shard_db_limbs(db_limbs, mesh: Mesh):
    """Place int8 MXU limbs with first-dim rows split over the mesh's
    "db" axis (other mesh axes replicate).  Requires the row count
    (trailing-axis groups) divisible by that axis size.

    db_limbs MUST be in the row-major layout
    (``db_to_mxu_limbs(..., row_major=True)``) — see row_shard_spec."""
    n_db = mesh.shape["db"]
    if db_limbs.shape[-1] % n_db != 0:
        raise ValueError(
            f"DB row axis {db_limbs.shape[-1]} not divisible by mesh "
            f"'db' axis size {n_db}")
    return jax.device_put(db_limbs, row_shard_spec(mesh))


# ---------------------------------------------------------------------------
# Contraction sharding (K-psum) on the production MXU kernel

def shard_db(db_data, mesh: Mesh):
    """Place the u32 encoded DB with the contraction axis K split over the
    mesh.  db_data: (num_per, n2, K, 2, d)."""
    return jax.device_put(
        db_data, NamedSharding(mesh, P(None, None, "db", None, None)))


def sharded_firstdim_and_fold(params: Params, mesh: Mesh,
                              use_mxu: bool = True):
    """Build a jitted (db, query_k, q_pos, q_neg) -> final ct function with
    the first-dim contraction sharded over the mesh and partials reduced
    with a modular psum (exact at any mesh size; see psum_mod)."""
    eng = crt_ntt(params.poly_len)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(None, None, "db", None, None),
                  P("db", None, None, None)),
        out_specs=P(),
    )
    def fdim(db_shard, qk_shard):
        if use_mxu:
            from ..server.firstdim import (db_to_mxu_limbs,
                                           multiply_query_by_db_mxu)
            limbs = db_to_mxu_limbs(db_shard)
            res = multiply_query_by_db_mxu(limbs, qk_shard)
            num_per, n2 = db_shard.shape[0], db_shard.shape[1]
            part = res.reshape(res.shape[:3] + (num_per, n2)).transpose(
                3, 2, 4, 0, 1)                  # (num_per, n1, n2, 2, d)
        else:
            from ..core.poly import matmul_raw
            part = matmul_raw(db_shard, qk_shard).transpose(0, 2, 1, 3, 4)
        return psum_mod_pair(part, "db")

    def step(db_data, query_k, q_pos, q_neg):
        cts_ntt = fdim(db_data, query_k)
        cts_coeff = eng.inverse(cts_ntt)
        return fold_ciphertexts(cts_coeff, q_pos, q_neg, params)

    return jax.jit(step)
