"""Attribute device time inside one K2 keyswitch call (N=64 evens=32,
production m_exp) by running prefix variants of the kernel body:
digits / +fwdNTT(digits) / +fwdNTT(row1) / +matmul / full."""
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
from spiral_tpu.arith.ntt_pallas import _tables
from spiral_tpu.server.fold_pallas import (_fold_tables, _fwd_tiled,
                                           _fwd_tiled_i8, _matmul_limb_2d)
from spiral_tpu.server.expand_pallas import (_ks_i8_bias, _ks_tile,
                                             _unsigned_digit_rows_i8,
                                             _unsigned_digit_rows_2d)

p = preset("spiral_20_256")
d = p.poly_len
m = p.m_exp
base = 2
MODS = (P_I, B_I)
tb_p, tb_b = _tables(P_I, d), _tables(B_I, d)
fwd_t, _ = _fold_tables(d)
print(f"m_exp={m} m_exp_right={p.m_exp_right} t_exp bits: "
      f"{_ks_i8_bias(m)} tile={_ks_tile(m)}")

rng = np.random.default_rng(0)


def rr(shape):
    a = rng.integers(0, P_I, size=shape, dtype=np.uint32)
    b = rng.integers(0, B_I, size=shape, dtype=np.uint32)
    return jnp.asarray(np.stack([a, b], axis=-2))


T = min(_ks_tile(m), 32)
cv = rr((T, base, d))
W = rr((base, m, d))
i8, bias = _ks_i8_bias(m)


def make(stage):
    def kernel(cv_ref, ca_ref, w_ref, f1, f2, f3, f4, out_ref):
        ca = ca_ref[...]
        fwd = (f1, f2, f3, f4)
        if stage == "copy":
            out_ref[...] = ca
            return
        if i8:
            rows8 = _unsigned_digit_rows_i8(ca[:, 0, 0, :], ca[:, 0, 1, :],
                                            m, bias)
            rp = rb = None
        else:
            rp, rb = _unsigned_digit_rows_2d(ca[:, 0, 0, :], ca[:, 0, 1, :],
                                             m)
        if stage == "digits":
            r0 = rows8.astype(jnp.uint32) if i8 else rp
            out_ref[...] = jnp.stack(
                [r0[:T * base].reshape(T, base, d)] * 2, axis=-2)
            return
        cvv = cv_ref[...]
        planes = []
        for li, tb, rows in ((0, tb_p, rp), (1, tb_b, rb)):
            ctx = mod_ctx(MODS[li])
            top = ca[:, 1, li, :]
            tabs_l = [t[li] for t in fwd]
            if i8:
                f_dig = _fwd_tiled_i8(tb, d, rows8, tabs_l)
            else:
                f_dig = _fwd_tiled(tb, d, rows, tabs_l)
            if stage == "nttdig":
                planes.append(f_dig[:T * base].reshape(T, base, d))
                continue
            c1_ntt = _fwd_tiled(tb, d, top, tabs_l)
            if stage == "nttall":
                o = f_dig[:T * base].reshape(T, base, d)
                o = ctx.add(o, jnp.broadcast_to(c1_ntt[:, None, :],
                                                o.shape))
                planes.append(o)
                continue
            dig = f_dig.reshape(m, T * d)
            W_l = w_ref[:, :, li, :]
            prod = _matmul_limb_2d(W_l, dig, ctx).reshape(base, T, d)
            if stage == "matmul":
                o = jnp.swapaxes(prod, 0, 1)
                o = ctx.add(o, jnp.broadcast_to(c1_ntt[:, None, :],
                                                o.shape))
                planes.append(o)
                continue
            out_l = ctx.add(cvv[:, :, li, :], jnp.swapaxes(prod, 0, 1))
            bottom = ctx.add(out_l[:, base - 1], c1_ntt)
            planes.append(jnp.concatenate(
                [out_l[:, :base - 1], bottom[:, None]], axis=1))
        out_ref[...] = jnp.stack(planes, axis=-2)

    table_specs = [
        pl.BlockSpec(t.shape, lambda nd=t.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for t in fwd_t
    ]

    def run(cv, W):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((T, base, 2, d), jnp.uint32),
            in_specs=[
                pl.BlockSpec((T, base, 2, d), lambda: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T, base, 2, d), lambda: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((base, m, 2, d), lambda: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ] + table_specs,
            out_specs=pl.BlockSpec((T, base, 2, d), lambda: (0, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(cv, cv, W, *[jnp.asarray(t) for t in fwd_t])

    return run


def timeit(name, fn, n=50):
    @jax.jit
    def runn(cv, W):
        return jax.lax.fori_loop(0, n, lambda i, v: fn(v, W), cv)

    jax.block_until_ready(runn(cv, W))
    t0 = time.perf_counter()
    jax.block_until_ready(runn(cv, W))
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt*1e6:.1f} us", flush=True)


for st in ("copy", "digits", "nttdig", "nttall", "matmul", "full"):
    timeit(st, make(st))
