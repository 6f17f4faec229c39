"""Per-stage device-time profiler for the Spiral pipeline.

Times each jitted server stage in isolation (post-compile, min over reps,
block_until_ready) so optimization effort goes to the true bottleneck rather
than to stage times inflated by the host<->TPU tunnel RTT.

    python tools/profile_stages.py [--preset spiral_20_256] [--reps 5]
    SPIRAL_NTT=stockham python tools/profile_stages.py
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timed(fn, *args, reps=5):
    out = fn(*args)
    jax_tree_block(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax_tree_block(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def jax_tree_block(x):
    import jax
    for leaf in jax.tree_util.tree_leaves(x):
        leaf.block_until_ready()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="spiral_20_256")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/spiral_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

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
    t0 = time.time()
    db = encode_db_chunked(pts, params)
    server = SpiralServer(params, db, pub)
    server._db_limbs.block_until_ready()
    print(f"db encode: {time.time() - t0:.1f}s", file=sys.stderr, flush=True)

    idx = int(rng.integers(0, params.total_n))
    query = client.query(idx)
    seed = jnp.int32(query.seed)

    r = args.reps
    t_exp, (first_scalars, gsw_scalars) = timed(
        server._stage_expand, seed, query.packed_b, reps=r)
    t_comp, C_reg = timed(server._stage_comp, first_scalars, reps=r)
    t_conv, (q_pos, q_neg) = timed(server._stage_conv, gsw_scalars, reps=r)
    t_fdim, cts_coeff = timed(
        server._stage_fdim, server._db_limbs, C_reg, reps=r)
    t_fold, final = timed(
        server._stage_fold, cts_coeff, q_pos, q_neg, reps=r)
    t_ms, _ = timed(server._stage_modswitch, final, reps=r)

    total = t_exp + t_comp + t_conv + t_fdim + t_fold + t_ms
    print(f"expansion   {t_exp*1e3:9.2f} ms")
    print(f"composition {t_comp*1e3:9.2f} ms")
    print(f"conversion  {t_conv*1e3:9.2f} ms")
    print(f"first-dim   {t_fdim*1e3:9.2f} ms")
    print(f"folding     {t_fold*1e3:9.2f} ms")
    print(f"modswitch   {t_ms*1e3:9.2f} ms")
    print(f"stage sum   {total*1e3:9.2f} ms")

    # fused single dispatch
    resp, fused_s = server.process_query_fused(query)
    best = fused_s
    for _ in range(args.trials):
        _, s = server.process_query_fused(query)
        best = min(best, s)
    db_bytes = params.total_n * params.n0 * params.n2 * params.poly_len
    print(f"fused       {best*1e3:9.2f} ms  "
          f"({db_bytes / best / 1e6:.0f} MB/s)")
    out = client.decode(resp)
    print(f"correct: {bool(np.array_equal(out, pts[idx].astype(object)))}")


if __name__ == "__main__":
    main()
