"""Attribute time inside the fused fold kernel: variants that run only a
prefix of the stage chain (digits / +fwdNTT / +matmul / full), at the
round-0 production shape, using the PRODUCTION int8-digit path
(t_gsw=9 -> bits_per=7).  Run on TPU."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from spiral_tpu.params import B_I, P_I, preset
from spiral_tpu.arith.mod import mod_ctx
from spiral_tpu.arith.ntt_pallas import _inv_body, _tables
from spiral_tpu.server.fold_pallas import (_fold_bias_corr, _fold_tables,
                                           _matmul_limb_2d,
                                           _signed_digit_rows_i8,
                                           _fwd_tiled_i8)

p = preset("spiral_20_256")
d = p.poly_len
TC = int(sys.argv[1]) if len(sys.argv) > 1 else 1
m_out = 64
t_gsw, n1, n2 = p.t_gsw, p.n1, p.n2
m2, P, L = t_gsw * n1, n1 * n2, n2 * d
MODS = (P_I, B_I)
tb_p, tb_b = _tables(P_I, d), _tables(B_I, d)
fwd_t, inv_t = _fold_tables(d)
tabs = fwd_t + inv_t

rng = np.random.default_rng(0)


def rr(shape):
    x = rng.integers(0, P_I, size=shape, dtype=np.uint32)
    y = rng.integers(0, B_I, size=shape, dtype=np.uint32)
    return jnp.asarray(np.stack([x, y], axis=-2))


cts = rr((m_out, 2, n1, n2, d)).reshape(m_out, 2, n1, n2, 2, d)
q_cat = rr((2, n1, m2, d))


def make(stage):
    def kernel(cts_ref, q_ref, f1, f2, f3, f4, i1, i2, i3, i4, corr_ref,
               out_ref):
        fwd = (f1, f2, f3, f4)
        inv = (i1, i2, i3, i4)
        ct = cts_ref[...]
        if stage == "copy":
            out_ref[...] = ct[:, 0]
            return
        rows_s = []
        for s in range(2):
            v = jnp.transpose(ct[:, s], (1, 0, 2, 3, 4)).reshape(
                n1 * TC * n2, 2, d)
            rows_s.append(_signed_digit_rows_i8(v[:, 0, :], v[:, 1, :],
                                                t_gsw))
        if stage == "digits":
            o = [jax.lax.slice_in_dim(r, 0, TC * P, axis=0).astype(
                jnp.uint32).reshape(TC, n1, n2, d) for r in rows_s]
            out_ref[...] = jnp.stack(o, axis=-2)
            return
        outs = []
        for li, tb in ((0, tb_p), (1, tb_b)):
            ctx = mod_ctx(MODS[li])
            acc = None
            for s in range(2):
                g = _fwd_tiled_i8(tb, d, rows_s[s], [t[li] for t in fwd])
                if stage == "ntt":
                    acc = g
                    break
                B = g.reshape(m2, TC * L)
                q_l = q_ref[s, :, :, li, :]
                p_s = _matmul_limb_2d(q_l, B, ctx)
                acc = p_s if acc is None else ctx.add(acc, p_s)
            if stage == "ntt":
                outs.append(jax.lax.slice_in_dim(
                    acc, 0, TC * P, axis=0).reshape(TC, n1, n2, d))
                continue
            t4 = acc.reshape(n1, TC, n2, d)
            t4 = ctx.add(t4, corr_ref[:, li, :][:, None, None, :])
            if stage == "matmul":
                outs.append(jnp.transpose(t4, (1, 0, 2, 3)))
                continue
            y = _inv_body(tb, d,
                          jnp.transpose(t4, (1, 0, 2, 3)).reshape(
                              TC * P, d), *[t[li] for t in inv])
            outs.append(y.reshape(TC, n1, n2, d))
        out_ref[...] = jnp.stack(outs, axis=-2)

    table_specs = [
        pl.BlockSpec(t.shape, lambda i, nd=t.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for t in tabs
    ]

    @jax.jit
    def run(cts_pairs, q):
        corr = _fold_bias_corr(q[1], q[0])
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((m_out, n1, n2, 2, d),
                                           jnp.uint32),
            grid=(m_out // TC,),
            in_specs=[
                pl.BlockSpec((TC, 2, n1, n2, 2, d),
                             lambda i: (i, 0, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, n1, m2, 2, d),
                             lambda i: (0, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ] + table_specs + [
                pl.BlockSpec((n1, 2, d), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TC, n1, n2, 2, d),
                                   lambda i: (i, 0, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=False,
        )(cts_pairs, q, *[jnp.asarray(t) for t in tabs], corr)

    return run


def timeit(name, fn, n=20):
    jax.device_get(fn(cts, q_cat))[0, 0, 0, :1]
    t0 = time.perf_counter()
    r = None
    for _ in range(n):
        r = fn(cts, q_cat)
    np.asarray(jax.device_get(r[0, 0, 0, :4]))
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)


for st in ("copy", "digits", "ntt", "matmul", "full"):
    timeit(st, make(st))
