"""Second Mosaic probe round: reshapes with int32 payloads, batched dots
at NTT shapes, and the actual fused-NTT building blocks.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_mosaic2.py
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 64


def run(name, kernel, out_shape, *args):
    try:
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape[0], out_shape[1]),
            in_specs=[pl.BlockSpec(a.shape, lambda: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM) for a in args],
            out_specs=pl.BlockSpec(out_shape[0],
                                   lambda: (0,) * len(out_shape[0]),
                                   memory_space=pltpu.VMEM),
        )
        np.asarray(f(*args))
        print(f"PASS {name}")
    except Exception as e:
        msg = str(e).split("\n")[0][:110]
        print(f"FAIL {name}: {msg}")


def main():
    print(f"devices: {jax.devices()}")
    x = jnp.arange(T * 2048, dtype=jnp.int32).reshape(T, 2048)

    run("reshape (T,2048)->(T,64,32) slice out",
        lambda xr, o: o.__setitem__(
            (...,), xr[...].reshape(T, 64, 32)[:, :, 0]),
        ((T, 64), jnp.int32), x)

    run("reshape (T,2048)->(T,16,128) sum-2",
        lambda xr, o: o.__setitem__(
            (...,), xr[...].reshape(T, 16, 128).sum(-2)),
        ((T, 128), jnp.int32), x)

    run("reshape (T,2048)->(T,8,256) sum-2",
        lambda xr, o: o.__setitem__(
            (...,), xr[...].reshape(T, 8, 256).sum(-2)),
        ((T, 256), jnp.int32), x)

    run("reshape+transpose (T,2048)->(T,64,32)->(T,32,64)",
        lambda xr, o: o.__setitem__(
            (...,), jnp.swapaxes(xr[...].reshape(T, 64, 32), -1, -2)),
        ((T, 32, 64), jnp.int32), x)

    # NTT step-1 as batched dot over TILE: (T, 32, 256)i8 @ (256, 256)i8
    a = jnp.ones((T, 32, 256), dtype=jnp.int8)
    w = jnp.ones((256, 256), dtype=jnp.int8)
    run("dot (T,32,256)x(256,256) no batch",
        lambda ar, wr, o: o.__setitem__((...,), jax.lax.dot_general(
            ar[...], wr[...],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)),
        ((T, 32, 256), jnp.int32), a, w)

    # batched over c=64: (64, T*32?, ...) too big; try (64, 8, 128)
    b = jnp.ones((64, 8, 128), dtype=jnp.int8)
    wb = jnp.ones((64, 128, 128), dtype=jnp.int8)
    run("dot batched c-major (64,8,128)@(64,128,128)",
        lambda br, wr, o: o.__setitem__((...,), jax.lax.dot_general(
            br[...], wr[...],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)),
        ((64, 8, 128), jnp.int32), b, wb)

    # 4D intermediate: (T, 32, 64, 4) from reshape of (T, 32, 256)
    y = jnp.ones((T, 32, 256), dtype=jnp.int32)
    run("reshape (T,32,256)->(T,32,64,4) slice",
        lambda yr, o: o.__setitem__(
            (...,), yr[...].reshape(T, 32, 64, 4)[..., 0]),
        ((T, 32, 64), jnp.int32), y)

    run("reshape (T,32,256)->(T,32,64,4) recombine",
        lambda yr, o: o.__setitem__(
            (...,), (lambda v: v[..., 0] + (v[..., 1] << 7) +
                     (v[..., 2] << 14) + (v[..., 3] << 21))(
                         yr[...].reshape(T, 32, 64, 4))),
        ((T, 32, 64), jnp.int32), y)

    # uint32 elementwise incl umulhi-style via u32 16-bit split
    xu = jnp.arange(T * 2048, dtype=jnp.uint32).reshape(T, 2048)
    run("u32 16-bit-split mulhi chain",
        lambda xr, o: o.__setitem__((...,), (lambda v: (
            (v >> 16) * jnp.uint32(0x9E37) +
            ((v & jnp.uint32(0xFFFF)) * jnp.uint32(0x79B9) >> 16)))(xr[...])),
        ((T, 2048), jnp.uint32), xu)

    # interleave write: out[:, 0::2] / out[:, 1::2]
    run("even/odd strided write",
        lambda xr, o: (o.__setitem__((slice(None), slice(0, None, 2)),
                                     xr[...][:, :1024]),
                       o.__setitem__((slice(None), slice(1, None, 2)),
                                     xr[...][:, 1024:])),
        ((T, 2048), jnp.int32), x)

    # gather along lanes (automorphism-style permutation)
    idx = jnp.asarray(np.random.default_rng(0).permutation(2048),
                      dtype=jnp.int32)
    run("lane gather x[:, perm]",
        lambda xr, ir, o: o.__setitem__((...,), xr[...][:, ir[...]]),
        ((T, 2048), jnp.int32), x, idx)


if __name__ == "__main__":
    main()
