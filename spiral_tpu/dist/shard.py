"""Multi-device sharding of the server pipeline.

The reference is single-core (ref: src/spiral.cpp:1231); scale-out here is
TPU-native (SURVEY.md §2.7): the first-dimension database tensor is
sharded over the contraction axis K = dim0*n0 across a 1-D device mesh,
each device computes partial n1 x n2 inner products over its DB shard, and
a psum over the mesh reduces them.  Expansion/conversion/folding operate
on query-sized data (KBs) and run replicated.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..params import Params
from ..arith.ntt import crt_ntt
from ..core.poly import matmul_raw, sub_raw
from ..server.fold import fold_ciphertexts


def make_db_mesh(devices=None, name: str = "db") -> Mesh:
    devices = jax.devices() if devices is None else devices
    return jax.make_mesh((len(devices),), (name,), devices=devices)


def shard_db(db_data, mesh: Mesh):
    """Place the encoded DB with the contraction axis K split over the mesh.

    db_data: (num_per, n2, K, 2, d).
    """
    return jax.device_put(
        db_data, NamedSharding(mesh, P(None, None, "db", None, None)))


def sharded_firstdim_and_fold(params: Params, mesh: Mesh):
    """Build a jitted (db, query_k, q_pos, q_neg) -> final ct function with
    the first-dim contraction sharded over the mesh and partials psum'd."""
    eng = crt_ntt(params.poly_len)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(None, None, "db", None, None),
                  P("db", None, None, None)),
        out_specs=P(),
    )
    def fdim(db_shard, qk_shard):
        part = matmul_raw(db_shard, qk_shard)   # (num_per, n2, n1, 2, d)
        tot = jax.lax.psum(part, "db")
        # per-shard partials are canonical mod p; their sum is < n_dev * p,
        # which stays inside u32 for n_dev <= 16 — reduce once after psum
        from ..arith.mod import mod_ctx
        from ..params import B_I, P_I
        assert mesh.devices.size <= 16, "reduce per-shard beyond 16 devices"
        return jnp.stack(
            [mod_ctx(P_I).reduce_u32(tot[..., 0, :]),
             mod_ctx(B_I).reduce_u32(tot[..., 1, :])], axis=-2)

    def step(db_data, query_k, q_pos, q_neg):
        cts_ntt = fdim(db_data, query_k).transpose(0, 2, 1, 3, 4)
        cts_coeff = eng.inverse(cts_ntt)
        return fold_ciphertexts(cts_coeff, q_pos, q_neg, params)

    return jax.jit(step)
