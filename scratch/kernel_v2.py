"""Kernel v2 prototype: 4-symbol refill window, fused width+adj, packed output.

Measured against v1 on a 30-frame shared-table batch (one dispatch, 94 MB
decoded) to remove the per-dispatch tunnel overhead from the comparison.
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from metalhuffman_tpu.core import bitstream, canonical
from metalhuffman_tpu.models import CodecConfig, ImageCodec
from metalhuffman_tpu.ops import decode_pallas, layout as layout_mod

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUBLANES, LANES = 8, 128


def canonical_meta_v2(widths):
    """v2 metadata: bounds + per-length adj increments as scalars, plus a
    128-lane packed symbol-pair table."""
    widths = np.asarray(widths, dtype=np.int64)
    counts = np.bincount(widths[widths > 0], minlength=17)
    first_rj = np.zeros(17, dtype=np.int64)
    code = 0
    for L in range(1, 17):
        first_rj[L] = code
        code = (code + int(counts[L])) << 1
    cum = np.zeros(17, dtype=np.int64)
    np.cumsum(counts[:16], out=cum[1:])

    bounds = np.zeros(16, dtype=np.int32)
    adj16 = np.zeros(16, dtype=np.int64)
    for L in range(1, 17):
        bounds[L - 1] = int(first_rj[L] << (16 - L)) & 0x7FFFFFFF
        adj16[L - 1] = int(cum[L] - first_rj[L])
    # incremental adj: adj(w) = adj16[0] + sum_{L<=w-1, L>=1} inc[L]
    inc = np.zeros(16, dtype=np.int32)
    inc[0] = adj16[0]
    for L in range(1, 16):
        inc[L] = int(adj16[L] - adj16[L - 1])

    active = np.nonzero(widths)[0]
    order = np.lexsort((active, widths[active]))
    syms = np.zeros(256, dtype=np.int32)
    syms[: active.size] = active[order]
    pair = syms[0::2] | (syms[1::2] << 8)  # 128 entries
    pair_vreg = np.tile(pair[None, :], (SUBLANES, 1)).astype(np.int32)
    return bounds, inc, pair_vreg


def make_kernel_v2(width, bounds, inc, unroll_outer=True):
    bounds = [int(b) for b in bounds]
    inc = [int(v) for v in inc]

    def kernel(rows_ref, init_ref, pair_ref, out_ref):
        rows = rows_ref[0]
        pair_tab = pair_ref[:]
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (width, SUBLANES, LANES), 0)

        def fetch(wi):
            oh = iota_w == wi[None]
            return jnp.sum(jnp.where(oh, rows, 0), axis=0)

        def outer(j, carry):
            bits, prev = carry
            wi = jax.lax.shift_right_logical(bits, 5)
            s = bits & 31
            w0 = fetch(wi)
            w1 = fetch(wi + 1)
            w2 = fetch(wi + 2)
            # 64-bit window left-justified at `bits`: (W0, W1)
            ls = s
            rs = 31 - s
            W0 = jax.lax.shift_left(w0, ls) | jax.lax.shift_right_logical(
                jax.lax.shift_right_logical(w1, 1), rs)
            W1 = jax.lax.shift_left(w1, ls) | jax.lax.shift_right_logical(
                jax.lax.shift_right_logical(w2, 1), rs)

            t = jnp.zeros_like(s)
            packed = jnp.zeros_like(s)
            for k in range(4):
                hi = jnp.where(t < 32, W0, W1)
                u = t & 31
                win32 = jax.lax.shift_left(hi, u) | jax.lax.shift_right_logical(
                    jax.lax.shift_right_logical(W1, 1), 31 - u)
                window = jax.lax.shift_right_logical(win32, 16)
                # fused width + adj accumulation
                w = jnp.ones_like(window)
                adj = jnp.full_like(window, inc[0])
                for L in range(2, 17):
                    m = (window >= bounds[L - 1]).astype(jnp.int32)
                    w = w + m
                    if inc[L - 1] != 0:
                        adj = adj + m * inc[L - 1]
                idx = adj + jax.lax.shift_right_logical(window, 16 - w)
                pairv = jnp.take_along_axis(
                    pair_tab, jax.lax.shift_right_logical(idx, 1) & 127, axis=1)
                sym = jnp.where(
                    (idx & 1) == 1,
                    jax.lax.shift_right_logical(pairv, 8), pairv) & 0xFF
                prev = (prev + sym) & 0xFF
                packed = packed | jax.lax.shift_left(prev, 8 * k)
                t = t + w
            out_ref[0, j] = packed
            return bits + t, prev

        bits0 = init_ref[0]
        prev0 = jnp.zeros((SUBLANES, LANES), jnp.int32)
        if unroll_outer:
            carry = (bits0, prev0)
            for j in range(16):
                carry = outer(j, carry)
        else:
            jax.lax.fori_loop(0, 16, outer, (bits0, prev0))

    return kernel


@partial(jax.jit, static_argnames=("width", "bounds", "inc", "unroll"))
def decode_v2(rows_tiled, init_tiled, pair_vreg, *, width, bounds, inc, unroll):
    nt = rows_tiled.shape[0]
    kernel = make_kernel_v2(width, bounds, inc, unroll)
    return pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, width, SUBLANES, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUBLANES, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 16, SUBLANES, LANES), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nt, 16, SUBLANES, LANES), jnp.int32),
    )(rows_tiled, init_tiled, pair_vreg)


def unpack_to_blocks(out32, nb):
    # (nt,16,8,128) int32 -> bytes (nt,16,8,128,4) -> (nb, 64)
    b = jax.lax.bitcast_convert_type(out32, jnp.uint8)  # little-endian bytes
    b = jnp.moveaxis(b, 1, -2)  # (nt,8,128,16,4)
    return b.reshape(-1, 64)[:nb]


def main():
    T = 30
    H, W_px = 1536, 2048
    rng = np.random.default_rng(0)
    yy, xx = np.meshgrid(np.arange(H), np.arange(W_px), indexing="ij")
    frames = []
    for i in range(T):
        img = np.clip(96 + 80 * np.sin((xx + 3 * i) / 97.0) * np.cos(yy / 71.0)
                      + rng.normal(0, 3.0, (H, W_px)), 0, 255).astype(np.uint8)
        frames.append(img)
    frames = np.stack(frames)

    # shared-table encode: concatenate all frames' block payloads
    from metalhuffman_tpu.core import blocks as blocks_mod
    from metalhuffman_tpu import native
    payload = np.concatenate(
        [native.delta_encode(blocks_mod.image_to_blocks(f).ravel(), 64) for f in frames])
    t0 = time.perf_counter()
    enc = native.encode_symbols(payload, block_size=64)
    print(f"encode {payload.size/1e6:.0f} MB in {time.perf_counter()-t0:.2f}s, "
          f"ratio {enc.compressed_size/payload.size:.3f}")

    total_bits = 8 * (enc.code_bytes.size - bitstream.READ_AHEAD_PAD_BYTES)
    width = layout_mod.words_per_block(
        layout_mod.max_block_bits(enc.block_offsets, total_bits))
    print("width", width, "blocks", enc.block_offsets.size)
    words = bitstream.bytes_to_be_words(enc.code_bytes, pad_words=width)
    rows, init, nb = decode_pallas.tile_layout_jax(
        jnp.asarray(words), jnp.asarray(enc.block_offsets.astype(np.int32)), width)
    rows = jax.device_put(rows); init = jax.device_put(init)

    payload_bytes = frames.size

    # --- v1 ---
    meta = decode_pallas.canonical_meta(enc.widths)
    meta_stack = jnp.asarray(np.stack([meta.adj, meta.syms_lo, meta.syms_hi]), jnp.int32)
    bounds_v1 = jnp.asarray(meta.bounds)
    f1 = jax.jit(lambda r, i: decode_pallas.decode_tiles(
        r, i, bounds_v1, meta_stack, num_steps=64, width=width, delta=True))
    r = f1(rows, init); r.block_until_ready()
    t0 = time.perf_counter(); iters = 20
    for _ in range(iters): r = f1(rows, init)
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    print(f"v1: {dt*1e3:8.3f} ms  {payload_bytes/dt/1e9:6.2f} GB/s")

    # verify v1
    blk = np.asarray(jnp.moveaxis(r, 1, -1).reshape(-1, 64)[:nb]).astype(np.uint8)
    ref = payload.reshape(-1, 64)
    ok = np.array_equal(
        np.asarray(blk), np.asarray(
            np.cumsum(ref, axis=1, dtype=np.int64) % 256).astype(np.uint8))
    print("v1 correct:", ok)

    # --- v2 ---
    bounds, inc, pair = canonical_meta_v2(enc.widths)
    pair_d = jax.device_put(jnp.asarray(pair))
    for unroll in (False, True):
        f2 = lambda r_, i_: decode_v2(r_, i_, pair_d, width=width,
                                      bounds=tuple(bounds), inc=tuple(inc),
                                      unroll=unroll)
        t0 = time.perf_counter()
        r2 = f2(rows, init); r2.block_until_ready()
        print(f"v2 unroll={unroll} compile+run1 {time.perf_counter()-t0:.1f}s")
        t0 = time.perf_counter()
        for _ in range(iters): r2 = f2(rows, init)
        r2.block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        print(f"v2 unroll={unroll}: {dt*1e3:8.3f} ms  {payload_bytes/dt/1e9:6.2f} GB/s")

    blk2 = np.asarray(jax.jit(lambda o: unpack_to_blocks(o, nb))(r2))
    ok2 = np.array_equal(blk2, np.asarray(
        np.cumsum(ref, axis=1, dtype=np.int64) % 256).astype(np.uint8))
    print("v2 correct:", ok2)


if __name__ == "__main__":
    main()
