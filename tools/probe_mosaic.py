"""Empirically probe which reshapes/transposes/dots Mosaic (Pallas TPU)
accepts on this chip — informs the fused-NTT kernel design.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_mosaic.py
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
        msg = str(e).split("\n")[0][:120]
        print(f"FAIL {name}: {msg}")


def main():
    print(f"devices: {jax.devices()}")
    x = jnp.arange(T * 2048, dtype=jnp.uint32).reshape(T, 2048)
    a8 = jnp.ones((256, 256), dtype=jnp.int8)
    x3 = jnp.arange(T * 16 * 128, dtype=jnp.uint32).reshape(T, 16, 128)

    run("reshape lane-split (T,2048)->(T,64,32)",
        lambda xr, o: o.__setitem__((...,), xr[...].reshape(T, 64, 32).sum(-1)),
        ((T, 64), jnp.uint32), x)

    run("reshape lane-split (T,2048)->(T,16,128)",
        lambda xr, o: o.__setitem__((...,), xr[...].reshape(T, 16, 128).sum(-2)),
        ((T, 128), jnp.uint32), x)

    run("reshape lane-split (T,2048)->(T,8,256)",
        lambda xr, o: o.__setitem__((...,), xr[...].reshape(T, 8, 256).sum(-2)),
        ((T, 256), jnp.uint32), x)

    run("reshape rows (T,2048)->(T*16,128)",
        lambda xr, o: o.__setitem__((...,), xr[...].reshape(T * 16, 128)),
        ((T * 16, 128), jnp.uint32), x)

    run("transpose last2 (T,16,128)->(T,128,16)",
        lambda xr, o: o.__setitem__((...,), jnp.swapaxes(xr[...], -1, -2)),
        ((T, 128, 16), jnp.uint32), x3)

    run("transpose 2d (256x2048)",
        lambda xr, o: o.__setitem__((...,), x2d_t(xr)),
        ((2048, T), jnp.uint32), x)

    run("dot int8 (256,256)@(256,256)",
        lambda ar, o: o.__setitem__((...,), jax.lax.dot_general(
            ar[...], ar[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)),
        ((256, 256), jnp.int32), a8)

    b3 = jnp.ones((8, 64, 64), dtype=jnp.int8)
    run("dot_general batched (8,64,64)@(8,64,64)",
        lambda br, o: o.__setitem__((...,), jax.lax.dot_general(
            br[...], br[...],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)),
        ((8, 64, 64), jnp.int32), b3)

    run("dot multi-contract (64,4,256)x(4,256,128)",
        lambda ar, br, o: o.__setitem__((...,), jax.lax.dot_general(
            ar[...], br[...],
            dimension_numbers=(((1, 2), (0, 1)), ((), ())),
            preferred_element_type=jnp.int32)),
        ((64, 128), jnp.int32),
        jnp.ones((64, 4, 256), dtype=jnp.int8),
        jnp.ones((4, 256, 128), dtype=jnp.int8))

    run("strided cols x[:, 5::32]",
        lambda xr, o: o.__setitem__((...,), xr[...][:, 5::32]),
        ((T, 64), jnp.uint32), x)

    run("int8->s32 widening dot from u32 shifts",
        lambda xr, o: o.__setitem__((...,), jax.lax.dot_general(
            ((xr[...] >> 7) & jnp.uint32(0x7F)).astype(jnp.int8)[:, :256],
            jnp.ones((256, 128), jnp.int8),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)),
        ((T, 128), jnp.int32), x)


def x2d_t(xr):
    return jnp.swapaxes(xr[...], 0, 1)


if __name__ == "__main__":
    main()
