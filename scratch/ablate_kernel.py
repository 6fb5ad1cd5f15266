"""Ablation microbenchmark for the Pallas decode kernel (run on real TPU).

Variants toggle the suspected cost centers:
  full       current kernel
  no_onehot  word fetch replaced with fixed words (removes 2x one-hot over W)
  no_gather  symbol/adj gathers replaced with arithmetic on the index
  no_store   dynamic per-step store replaced with accumulator + single store
  unrolled   python-unrolled 64-step loop (static store indices)
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from metalhuffman_tpu.core import bitstream
from metalhuffman_tpu.models import CodecConfig, ImageCodec
from metalhuffman_tpu.ops import decode_pallas, layout as layout_mod

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUBLANES, LANES = 8, 128


def make_kernel(num_steps, width, variant):
    def kernel(bounds_ref, rows_ref, init_ref, meta_ref, out_ref):
        rows = rows_ref[0]
        adj_tab = meta_ref[0]
        syms_lo = meta_ref[1]
        syms_hi = meta_ref[2]
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (width, SUBLANES, LANES), 0)

        def body(i, carry):
            bits, prev, acc = carry
            if variant == "no_onehot":
                w0 = rows[0]
                w1 = rows[1]
            else:
                wi = jax.lax.shift_right_logical(bits, 5)
                oh0 = iota_w == wi[None]
                oh1 = iota_w == (wi + 1)[None]
                w0 = jnp.sum(jnp.where(oh0, rows, 0), axis=0)
                w1 = jnp.sum(jnp.where(oh1, rows, 0), axis=0)
            s = bits & 31
            hi32 = jax.lax.shift_left(w0, s) | jax.lax.shift_right_logical(
                jax.lax.shift_right_logical(w1, 1), 31 - s
            )
            window = jax.lax.shift_right_logical(hi32, 16)
            w = jnp.ones_like(window)
            for L in range(2, 17):
                w = w + (window >= bounds_ref[0, L - 1]).astype(jnp.int32)
            if variant == "no_gather":
                idx = w + jax.lax.shift_right_logical(window, 16 - w)
                sym = idx & 255
            else:
                idx = jnp.take_along_axis(adj_tab, w - 1, axis=1) + \
                    jax.lax.shift_right_logical(window, 16 - w)
                lo = jnp.take_along_axis(syms_lo, idx & 127, axis=1)
                hi = jnp.take_along_axis(syms_hi, idx & 127, axis=1)
                sym = jnp.where(idx >= 128, hi, lo)
            prev = (prev + sym) & 0xFF
            if variant == "no_store":
                acc = acc + prev
            else:
                out_ref[0, i] = prev
            return bits + w, prev, acc

        bits0 = init_ref[0]
        prev0 = jnp.zeros((SUBLANES, LANES), jnp.int32)
        acc0 = jnp.zeros((SUBLANES, LANES), jnp.int32)
        if variant == "unrolled":
            carry = (bits0, prev0, acc0)
            for i in range(num_steps):
                bits, prev, acc = carry
                wi = jax.lax.shift_right_logical(bits, 5)
                oh0 = iota_w == wi[None]
                oh1 = iota_w == (wi + 1)[None]
                w0 = jnp.sum(jnp.where(oh0, rows, 0), axis=0)
                w1 = jnp.sum(jnp.where(oh1, rows, 0), axis=0)
                s = bits & 31
                hi32 = jax.lax.shift_left(w0, s) | jax.lax.shift_right_logical(
                    jax.lax.shift_right_logical(w1, 1), 31 - s
                )
                window = jax.lax.shift_right_logical(hi32, 16)
                w = jnp.ones_like(window)
                for L in range(2, 17):
                    w = w + (window >= bounds_ref[0, L - 1]).astype(jnp.int32)
                idx = jnp.take_along_axis(adj_tab, w - 1, axis=1) + \
                    jax.lax.shift_right_logical(window, 16 - w)
                lo = jnp.take_along_axis(syms_lo, idx & 127, axis=1)
                hi = jnp.take_along_axis(syms_hi, idx & 127, axis=1)
                sym = jnp.where(idx >= 128, hi, lo)
                prev = (prev + sym) & 0xFF
                out_ref[0, i] = prev
                carry = (bits + w, prev, acc)
            _, _, acc = carry
        else:
            _, _, acc = jax.lax.fori_loop(0, num_steps, body, (bits0, prev0, acc0))
        if variant == "no_store":
            out_ref[0, 0] = acc

    return kernel


@partial(jax.jit, static_argnames=("num_steps", "width", "variant"))
def run_variant(rows_tiled, init_tiled, bounds, meta, *, num_steps, width, variant):
    nt = rows_tiled.shape[0]
    kernel = make_kernel(num_steps, width, variant)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, width, SUBLANES, LANES), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUBLANES, LANES), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, SUBLANES, LANES), lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, num_steps, SUBLANES, LANES),
                               lambda i, *_: (i, 0, 0, 0), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nt, num_steps, SUBLANES, LANES), jnp.int32),
    )(bounds, rows_tiled, init_tiled, meta)


def main():
    H, W_px = 1536, 2048
    rng = np.random.default_rng(0)
    yy, xx = np.meshgrid(np.arange(H), np.arange(W_px), indexing="ij")
    img = np.clip(96 + 80 * np.sin(xx / 97.0) * np.cos(yy / 71.0) + xx * 0.01
                  + rng.normal(0, 3.0, (H, W_px)), 0, 255).astype(np.uint8)
    codec = ImageCodec(CodecConfig(backend="pallas"))
    enc = codec.encode(img)

    meta = decode_pallas.canonical_meta(enc.widths)
    total_bits = 8 * (enc.code_bytes.size - bitstream.READ_AHEAD_PAD_BYTES)
    mb = layout_mod.max_block_bits(enc.block_offsets, total_bits)
    width = layout_mod.words_per_block(mb)
    print(f"max_block_bits={mb} width={width} ratio={enc.compressed_size/img.size:.3f}")
    words = bitstream.bytes_to_be_words(enc.code_bytes, pad_words=width)
    rows, init, nb = decode_pallas.tile_layout_jax(
        jnp.asarray(words), jnp.asarray(enc.block_offsets.astype(np.int32)), width)
    rows = jax.device_put(rows)
    init = jax.device_put(init)
    meta_stack = jnp.asarray(np.stack([meta.adj, meta.syms_lo, meta.syms_hi]), jnp.int32)
    bounds = jnp.asarray(meta.bounds)

    payload = H * W_px
    for variant in ["full", "no_onehot", "no_gather", "no_store", "unrolled"]:
        f = lambda: run_variant(rows, init, bounds, meta_stack,
                                num_steps=64, width=width, variant=variant)
        r = f(); r.block_until_ready()
        t0 = time.perf_counter()
        iters = 30
        for _ in range(iters):
            r = f()
        r.block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        print(f"{variant:10s} {dt*1e3:7.3f} ms  {payload/dt/1e9:6.2f} GB/s")


if __name__ == "__main__":
    main()
