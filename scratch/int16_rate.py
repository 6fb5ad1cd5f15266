"""Is int16 elementwise arithmetic double-rate on v5e? Gates the SWAR idea.

Times a Pallas kernel of N chained dependent ops (add + compare-select mix,
the decode kernel's profile) on int32 (8,128)-tiles vs int16 (16,128)-tiles
processing the SAME element count. If int16 packs 2/lane at full rate, the
int16 variant should run ~2x faster per element.

Run on the real chip: python scratch/int16_rate.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHAIN = 512  # dependent op pairs per element
TILES = 256  # grid size


def make_kernel(dtype):
    def kernel(x_ref, o_ref):
        v = x_ref[0]
        acc = jnp.zeros_like(v)
        for _ in range(CHAIN):
            v = v + np.asarray(1, dtype)         # dependent add
            acc = acc + (v > np.asarray(7, dtype)).astype(dtype)
        o_ref[0] = v + acc

    return kernel


def run(dtype, shape):
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 100, (TILES,) + shape), dtype)
    call = pl.pallas_call(
        make_kernel(dtype),
        grid=(TILES,),
        in_specs=[pl.BlockSpec((1,) + shape, lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1,) + shape, lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TILES,) + shape, dtype),
    )
    fn = jax.jit(call)
    r = fn(x)
    float(jnp.sum(r[..., :1, :1].astype(jnp.int32)))  # warm + barrier
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        r = fn(x)
        float(jnp.sum(r[..., :1, :1].astype(jnp.int32)))
        best = min(best, time.perf_counter() - t0)
    elems = TILES * int(np.prod(shape))
    ops = elems * CHAIN * 3
    print(f"{dtype.__name__:6s} {shape}: {best*1e3:7.2f} ms  "
          f"{ops/best/1e12:6.2f} T ops/s")
    return best


def main():
    print(f"device={jax.devices()[0].device_kind}", file=sys.stderr)
    t32 = run(jnp.int32, (8, 128))
    t16 = run(jnp.int16, (16, 128))  # same vreg footprint, 2x elements
    t16s = run(jnp.int16, (8, 128))  # same element count as int32
    print(f"int16(16,128) vs int32(8,128) per-element speedup: "
          f"{2*t32/t16:.2f}x")
    print(f"int16(8,128) vs int32(8,128): {t32/t16s:.2f}x")


if __name__ == "__main__":
    main()
