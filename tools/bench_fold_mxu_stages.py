"""Attribute device time inside one MXU-path fold round (round 0,
spiral_20_256): kernel A (digits+NTT) / +limbify+dot / +recombine /
+inverse NTT, with the profiling.py chained-prefix method."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from spiral_tpu.params import B_I, P_I, preset
from spiral_tpu.server.fold_pallas import (_fold_bias_corr, _fold_ntt_call,
                                           _fold_qpre, _fold_contract_mxu)
from spiral_tpu.arith.ntt_pallas import crt_ntt_pallas
from spiral_tpu.arith.mod import mod_ctx
from spiral_tpu.params import B_I, P_I

p = preset("spiral_20_256")
d = p.poly_len
MODS = (P_I, B_I)
rng = np.random.default_rng(0)
ITERS = 8


def rr(shape):
    x = rng.integers(0, P_I, size=shape, dtype=np.uint32)
    y = rng.integers(0, B_I, size=shape, dtype=np.uint32)
    return jnp.asarray(np.stack([x, y], axis=-2))


m = p.num_per
_dev = jax.jit(lambda x: x + 0)
cts = _dev(rr((m, p.n1, p.n2, d)))
qp = _dev(rr((p.nu_2, p.n1, p.m2, d)))
qn = _dev(rr((p.nu_2, p.n1, p.m2, d)))
jax.block_until_ready((cts, qp, qn))

mo = m // 2
eng = crt_ntt_pallas(d)


def round0(cts, qp, qn, stage):
    cts_pairs = cts.reshape((mo, 2) + cts.shape[1:])
    G6 = _fold_ntt_call(mo, p.t_gsw, p.n1, p.n2, d, False)(cts_pairs)
    if stage == "kernelA":
        return G6
    q_cat = jnp.stack([qn[0], qp[0]])
    Qpre = _fold_qpre(q_cat, p.t_gsw, p.n1)
    if stage == "dot":
        G7 = G6.reshape(2, 2, p.t_gsw, mo, p.n1, p.n2, d)
        planes = [((G7 >> jnp.uint32(7 * j)) & jnp.uint32(0x7F)
                   ).astype(jnp.int8) for j in range(4)]
        Gl = jnp.stack(planes, axis=6)
        return jax.lax.dot_general(
            Qpre, Gl,
            dimension_numbers=(((1, 2, 3, 4), (1, 2, 4, 6)),
                               ((0, 6), (0, 7))),
            preferred_element_type=jnp.int32)
    corr = _fold_bias_corr(qp[0], qn[0])
    v = _fold_contract_mxu(G6, Qpre, corr, p.t_gsw, p.n1, p.n2)
    if stage == "contract":
        return v
    return eng.inverse(v)


def timeit(name, stage, reps=3):
    @jax.jit
    def iterated(cts, qp, qn):
        def body(i, acc):
            out = round0(cts + acc, qp, qn, stage)
            return acc + out.ravel()[0].astype(jnp.uint32)
        return jax.lax.fori_loop(0, ITERS, body, jnp.uint32(0))

    int(iterated(cts, qp, qn))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        int(iterated(cts, qp, qn))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best / ITERS * 1e3:.2f} ms", flush=True)


for st in ("kernelA", "dot", "contract", "full"):
    timeit(st, st)
