"""Device-true spiralpack pipeline stage attribution via the
chained-prefix method (scalar-fetch sync, operands as jit args).
Builds a real PackServer at spiralpack_20_256 and times cumulative
stage prefixes of the single-dispatch program."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from spiral_tpu.params import preset
from spiral_tpu.pack import PackClient, PackServer, encode_pack_db

ITERS = 8
p = preset("spiralpack_20_256")
rng = np.random.default_rng(0)
pts = rng.integers(0, p.p_db, size=(p.total_n, p.out_n, p.out_n,
                                    p.poly_len), dtype=np.int16)
client = PackClient(p, seed=1)
pub = client.setup()
server = PackServer(p, encode_pack_db(pts, p), pub)
query = client.query(int(rng.integers(0, p.total_n)))
seed = jnp.int32(query.seed)


def prefix(depth):
    def run(db_limbs, seed, packed_b):
        def tap(acc, x):
            return acc + x.astype(jnp.uint32).ravel()[0]

        acc = jnp.uint32(0)
        first, gsw_src = server._stage_expand.__wrapped__(seed, packed_b)
        acc = tap(tap(acc, first), gsw_src)
        if depth == 1:
            return acc
        q_pos, q_neg = server._stage_conv.__wrapped__(gsw_src)
        acc = tap(acc, q_neg)
        if depth == 2:
            return acc
        cts = server._stage_fdim.__wrapped__(db_limbs, first)
        acc = tap(acc, cts)
        if depth == 3:
            return acc
        result = server._stage_fold.__wrapped__(cts, q_pos, q_neg)
        acc = tap(acc, result)
        if depth == 4:
            return acc
        rows = server._stage_pack.__wrapped__(result)
        return tap(acc, rows[1])

    @jax.jit
    def iterated(db_limbs, seed, packed_b):
        def body(i, acc):
            return acc + run(db_limbs, seed + i, packed_b)
        return jax.lax.fori_loop(0, ITERS, body, jnp.uint32(0))

    return iterated


names = ("expand", "conv", "fdim", "fold", "pack")
prev = 0.0
for depth in range(1, 6):
    f = prefix(depth)
    int(f(server._db_limbs, seed, query.packed_b))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        int(f(server._db_limbs, seed, query.packed_b))
        best = min(best, time.perf_counter() - t0)
    t = best / ITERS
    print(f"{names[depth - 1]}: cum {t*1e3:.2f} ms (+{(t - prev)*1e3:.2f})",
          flush=True)
    prev = t
