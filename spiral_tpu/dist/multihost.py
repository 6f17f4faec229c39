"""Multi-host serving runtime (SURVEY.md §2.7 / §5).

The reference is a single-process, single-core binary
(ref: src/spiral.cpp:1231); production TPU serving spans processes
(hosts), each driving its local chips, coordinated by jax.distributed.
This module is the multi-controller layer on top of the row-sharded
serving program (dist/shard.py, pir.py mesh mode):

  1. `initialize()` — bootstrap the distributed runtime (one process per
     host, every process runs the same program: standard JAX SPMD).
  2. per-host DB ingest — `host_record_indices()` tells host h which
     records its first-dim row range needs; `encode_db_local()` encodes
     ONLY those (no process materialises the full database);
     `assemble_global_db()` stitches the per-process shards into one
     global row-sharded array (jax.make_array_from_process_local_data).
  3. `SpiralServer(params, db=ShardedLimbsDb(...), mesh=global_mesh())`
     then serves exactly as in the single-process mesh path: the
     first-dim multiply is collective-free, fold's ct exchanges ride the
     `db` mesh axis (ICI within a host, DCN across hosts — both tiny:
     one ciphertext per device).

Launch recipe (N hosts):
    SPIRAL_COORD=host0:8476 SPIRAL_NPROC=N SPIRAL_PID=<h> python serve.py
with serve.py calling initialize() then the ingest + serve steps; see
tests/test_multihost.py for a complete 2-process CPU example.
"""
from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..params import B_I, P_I, Params
from ..arith.ntt import crt_ntt
from ..server.db import ShardedLimbsDb, bitrev_perm
from ..server.firstdim import db_to_mxu_limbs


def initialize(coordinator: str, num_processes: int, process_id: int,
               **kw) -> None:
    """jax.distributed bootstrap.  Call once at process start, before any
    device use.  On TPU pods the three arguments are inferred from the
    environment and may be omitted upstream; they are explicit here so
    the CPU test harness can drive arbitrary topologies."""
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id, **kw)


def global_mesh(name: str = "db") -> Mesh:
    """1-D mesh over every device of every process (global view)."""
    return jax.make_mesh((len(jax.devices()),), (name,))


def host_row_range(params: Params, num_processes: int,
                   process_id: int) -> tuple[int, int]:
    """[start, end) of the first-dim row POSITIONS owned by this host
    (positions index the bit-reversed serving layout, server/db.py)."""
    if params.num_per % num_processes:
        raise ValueError(
            f"num_per {params.num_per} not divisible by "
            f"{num_processes} processes")
    per = params.num_per // num_processes
    return process_id * per, (process_id + 1) * per


def host_record_indices(params: Params, num_processes: int,
                        process_id: int) -> np.ndarray:
    """Global record indices this host must ingest, shaped
    (dim0, rows_local): entry [j, r] is the record stored at local row
    position r for first-dim index j.  Row position pos holds
    further-index bitrev(pos) (server/db.py), and record
    i = j * num_per + ii lives at (j, ii)."""
    r0, r1 = host_row_range(params, num_processes, process_id)
    ii = bitrev_perm(params.num_per)[r0:r1]          # (rows_local,)
    j = np.arange(params.dim0)[:, None]
    return j * params.num_per + ii[None, :]


def encode_db_local(pts_local: np.ndarray, params: Params) -> jnp.ndarray:
    """Encode this host's row slice.  pts_local: (dim0, rows_local, n0,
    n2, d) plaintexts ordered as host_record_indices — i.e.
    pts_local[j, r] = pts[host_record_indices(...)[j, r]].

    Returns (2, d, K, rows_local*n2*4) int8 MXU limbs (row-major column
    order — the only shardable layout, dist/shard.py).  Mirrors
    encode_db (server/db.py) minus the bit-reversal, which is already
    baked into the record ordering."""
    p_db = params.p_db
    centered = np.where(pts_local >= p_db // 2, pts_local - p_db, pts_local)
    limb_p = np.where(centered < 0, centered + P_I,
                      centered).astype(np.uint32)
    limb_b = np.where(centered < 0, centered + B_I,
                      centered).astype(np.uint32)
    res = jnp.asarray(np.stack([limb_p, limb_b], axis=-2))
    ntt = crt_ntt(params.poly_len).forward(res)  # (dim0, rows, n0, n2, 2, d)
    t = ntt.transpose(1, 3, 0, 2, 4, 5)          # (rows, n2, dim0, n0, 2, d)
    rows_local = pts_local.shape[1]
    t = t.reshape(rows_local, params.n2, params.dim0 * params.n0, 2,
                  params.poly_len)
    return db_to_mxu_limbs(t, row_major=True)


def assemble_global_db(local_limbs, params: Params,
                       mesh: Mesh) -> ShardedLimbsDb:
    """Stitch per-process row shards into ONE global jax.Array sharded
    over the mesh's "db" axis.  local_limbs is this process's
    (2, d, K, rows_local*n2*4) tensor; the runtime splits it further
    across this process's local devices."""
    n_dev = mesh.devices.size
    rows_local = local_limbs.shape[-1]
    global_shape = local_limbs.shape[:-1] + (
        rows_local * jax.process_count(),)
    sharding = NamedSharding(mesh, P(None, None, None, "db"))
    if params.num_per % n_dev:
        raise ValueError(
            f"num_per {params.num_per} not divisible by mesh size {n_dev}")
    arr = jax.make_array_from_process_local_data(
        sharding, np.asarray(local_limbs), global_shape)
    return ShardedLimbsDb(limbs=arr, params=params)


def ingest_and_serve(pts_provider, params: Params, pub,
                     num_processes: int | None = None,
                     process_id: int | None = None):
    """End-to-end per-host setup: fetch this host's records, encode,
    assemble, build the server.  `pts_provider(record_indices)` returns
    the (dim0, rows_local, n0, n2, d) plaintext block — typically a read
    from the host's storage shard."""
    from ..pir import SpiralServer

    num_processes = num_processes or jax.process_count()
    process_id = process_id if process_id is not None else jax.process_index()
    mesh = global_mesh()
    idx = host_record_indices(params, num_processes, process_id)
    local = encode_db_local(pts_provider(idx), params)
    db = assemble_global_db(local, params, mesh)
    return SpiralServer(params, db, pub, mesh=mesh)
