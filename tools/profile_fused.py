"""Cumulative fused-pipeline profiler.

Times jitted prefixes of the server pipeline (expand | +comp | +conv |
+fdim | +fold | +modswitch) with the RTT amortized by running K
seed-perturbed iterations inside one jit (prevents CSE), then reports the
per-stage deltas — the true device cost of each stage inside the fused
program, free of the per-dispatch tunnel latency that pollutes staged
timings.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_fused.py
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="spiral_20_256")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/spiral_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from spiral_tpu.params import preset
    from spiral_tpu.pir import SpiralClient, SpiralServer
    from spiral_tpu.server.db import encode_db_chunked

    params = preset(args.preset)
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    client = SpiralClient(params, seed=1)
    pub = client.setup()
    pts = rng.integers(0, params.p_db,
                       size=(params.total_n, params.n0, params.n2,
                             params.poly_len), dtype=np.int16)
    db = encode_db_chunked(pts, params)
    server = SpiralServer(params, db, pub)
    server._db_limbs.block_until_ready()
    query = client.query(int(rng.integers(0, params.total_n)))

    # rebuild the stage closures (mirrors _build_stages internals)
    p = params
    expand = server._stage_expand._fun if hasattr(
        server._stage_expand, "_fun") else None

    # instead of reaching into jit internals, re-derive prefix programs
    # from the public stage functions via their jitted handles
    def prefix_builder(depth):
        def run(db_limbs, seed, packed_b):
            # sum a scalar from every intermediate so no prefix stage is
            # dead-code-eliminated
            import jax.numpy as jnp

            def tap(acc, x):
                return acc + x.astype(jnp.uint32).ravel()[0]

            acc = jnp.uint32(0)
            fs, gs = server._stage_expand.__wrapped__(seed, packed_b)
            acc = tap(tap(acc, fs), gs)
            if depth == 1:
                return acc
            C = server._stage_comp.__wrapped__(fs)
            acc = tap(acc, C)
            if depth == 2:
                return acc
            qp, qn = server._stage_conv.__wrapped__(gs)
            acc = tap(tap(acc, qp), qn)
            if depth == 3:
                return acc
            cts = server._stage_fdim.__wrapped__(db_limbs, C)
            acc = tap(acc, cts)
            if depth == 4:
                return acc
            final = server._stage_fold.__wrapped__(cts, qp, qn)
            acc = tap(acc, final)
            if depth == 5:
                return acc
            return tap(acc, server._stage_modswitch.__wrapped__(final)[1])

        K = args.iters

        @jax.jit
        def iterated(db_limbs, seed, packed_b):
            def body(i, acc):
                return acc + run(db_limbs, seed + i, packed_b)
            return jax.lax.fori_loop(0, K, body, jnp.uint32(0))

        return iterated

    names = ["expand", "+comp", "+conv", "+fdim", "+fold", "+modswitch"]
    seed = jnp.int32(query.seed)
    times = []
    for depth in range(1, 7):
        f = prefix_builder(depth)
        # int() fetches the scalar to the host — the only reliable sync
        # over the remote-TPU tunnel (block_until_ready under-reports)
        int(f(server._db_limbs, seed, query.packed_b))
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            int(f(server._db_limbs, seed, query.packed_b))
            best = min(best, time.perf_counter() - t0)
        per = best / args.iters
        times.append(per)
        print(f"prefix {names[depth-1]:11s} {per*1e3:9.2f} ms/iter")
    print("--- deltas ---")
    prev = 0.0
    for n, t in zip(names, times):
        print(f"{n:12s} {(t - prev)*1e3:9.2f} ms")
        prev = t


if __name__ == "__main__":
    main()
