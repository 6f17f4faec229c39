"""NTT engine throughput tuner: poly-limbs/s at several batch sizes,
honest host-sync timing (scalar fetch), per engine.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/tune_ntt.py
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="256,1024,4096,16384")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--engines", default="pallas,mxu")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/spiral_jax_cache")

    from spiral_tpu.params import B_I, P_I

    d = 2048
    rng = np.random.default_rng(0)
    K = args.iters

    def make_engine(name):
        if name == "pallas":
            from spiral_tpu.arith.ntt_pallas import CrtNttPallas
            return CrtNttPallas(d)
        from spiral_tpu.arith.ntt_mxu import CrtNttMxu
        return CrtNttMxu(d)

    for name in args.engines.split(","):
        eng = make_engine(name)
        for B in (int(x) for x in args.batches.split(",")):
            x = np.stack([
                rng.integers(0, P_I, size=(B, d), dtype=np.uint64),
                rng.integers(0, B_I, size=(B, d), dtype=np.uint64),
            ], axis=1).astype(np.uint32)
            xj = jnp.asarray(x)

            @jax.jit
            def loop(xj):
                carry = jnp.uint32(0)
                acc = jnp.uint32(0)
                v = xj
                for _ in range(K):
                    v = eng.forward(v + carry)
                    carry = jnp.ravel(v)[0] & jnp.uint32(1)
                    acc = acc + jnp.ravel(v)[-1]
                return acc

            int(loop(xj))
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                int(loop(xj))
                best = min(best, (time.perf_counter() - t0) / K)
            pls = 2 * B / best
            print(f"{name:7s} B={B:6d}  {best * 1e3:8.3f} ms/fwd  "
                  f"{pls / 1e6:7.2f} M poly-limbs/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
