"""Prototype: kernel emits image-strip layout (in-kernel lane interleave).

Output (ng, sub, 8, 256): program x (row,half) sublanes x pixel-row dy x
half-row int32 words. The only XLA post-op left is a coarse (h, dy) swap with
1 KB contiguous chunks + bitcast.
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from metalhuffman_tpu.core import bitstream
from metalhuffman_tpu.models import CodecConfig, frame_stream
from metalhuffman_tpu.ops import decode_pallas, layout as layout_mod

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUBLANES, LANES = 8, 128


def make_kernel(width, bounds, adj_inc, sub, h2):
    base_w = 1
    base_adj = int(adj_inc[0])
    terms = []
    for L in range(2, 17):
        b = int(bounds[L - 1])
        if b == 0:
            base_w += 1
            base_adj += int(adj_inc[L - 1])
        elif b < (1 << 16):
            terms.append((b, int(adj_inc[L - 1])))

    def kernel(rows_ref, init_ref, pair_ref, out_ref):
        rows = rows_ref[0]
        pair_tab = pair_ref[:]
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (width - 2, sub, LANES), 0)
        rows_a = rows[: width - 2]
        rows_b = rows[1 : width - 1]
        rows_c = rows[2:width]
        lane = jax.lax.broadcasted_iota(jnp.int32, (sub, LANES), 1)
        half_idx = lane >> 1          # l // 2
        parity = (lane & 1) == 1

        def group(carry):
            bits, prev = carry
            wi = jax.lax.shift_right_logical(bits, 5)
            s = bits & 31
            oh = iota_w == wi[None]
            w0 = jnp.sum(jnp.where(oh, rows_a, 0), axis=0)
            w1 = jnp.sum(jnp.where(oh, rows_b, 0), axis=0)
            w2 = jnp.sum(jnp.where(oh, rows_c, 0), axis=0)
            rs = 31 - s
            W0 = jax.lax.shift_left(w0, s) | jax.lax.shift_right_logical(
                jax.lax.shift_right_logical(w1, 1), rs)
            W1 = jax.lax.shift_left(w1, s) | jax.lax.shift_right_logical(
                jax.lax.shift_right_logical(w2, 1), rs)
            t = jnp.zeros_like(s)
            packed = jnp.zeros_like(s)
            for k in range(4):
                hi = jnp.where(t < 32, W0, W1)
                u = t & 31
                win32 = jax.lax.shift_left(hi, u) | jax.lax.shift_right_logical(
                    jax.lax.shift_right_logical(W1, 1), 31 - u)
                window = jax.lax.shift_right_logical(win32, 16)
                w = jnp.full_like(window, base_w)
                adj = jnp.full_like(window, base_adj)
                for b, ai in terms:
                    m = (window >= b).astype(jnp.int32)
                    w = w + m
                    if ai != 0:
                        adj = adj + m * ai
                idx = adj + jax.lax.shift_right_logical(window, 16 - w)
                pairv = jnp.take_along_axis(
                    pair_tab, jax.lax.shift_right_logical(idx, 1) & 127, axis=1)
                sym = jnp.where(
                    (idx & 1) == 1,
                    jax.lax.shift_right_logical(pairv, 8), pairv) & 0xFF
                prev = (prev + sym) & 0xFF
                packed = packed | jax.lax.shift_left(prev, 8 * k)
                t = t + w
            return (bits + t, prev), packed

        carry = (init_ref[0], jnp.zeros((sub, LANES), jnp.int32))
        for dy in range(8):
            carry, p0 = group(carry)   # i = 0 (pixels 0..3 of row dy)
            carry, p1 = group(carry)   # i = 1 (pixels 4..7)
            # interleave across lanes: word k of the half-row = block k>>1,
            # word-half k&1 -> lo covers words 0..127, hi covers 128..255
            p0a = jnp.take_along_axis(p0, half_idx, axis=1)
            p1a = jnp.take_along_axis(p1, half_idx, axis=1)
            lo = jnp.where(parity, p1a, p0a)
            p0b = jnp.take_along_axis(p0, 64 + half_idx, axis=1)
            p1b = jnp.take_along_axis(p1, 64 + half_idx, axis=1)
            hi2 = jnp.where(parity, p1b, p0b)
            rows_pp = sub // h2
            for h in range(h2):
                sl = slice(h * rows_pp, (h + 1) * rows_pp)
                out_ref[0, :, dy, (2 * h) * LANES : (2 * h + 1) * LANES] = lo[sl]
                out_ref[0, :, dy, (2 * h + 1) * LANES : (2 * h + 2) * LANES] = hi2[sl]

    return kernel


@partial(jax.jit, static_argnames=("width", "bounds", "adj_inc", "g", "h2"))
def decode_strips(rows_tiled, init_tiled, pair_vreg, *, width, bounds, adj_inc,
                  g=8, h2=2):
    nt = rows_tiled.shape[0]
    ng = nt // g
    sub = g * SUBLANES
    rows_pp = sub // h2
    rows_g = rows_tiled.reshape(ng, g, width, SUBLANES, LANES).transpose(
        0, 2, 1, 3, 4).reshape(ng, width, sub, LANES)
    init_g = init_tiled.reshape(ng, sub, LANES)
    pair_g = jnp.tile(pair_vreg, (g, 1))
    kernel = make_kernel(width, bounds, adj_inc, sub, h2)
    return pl.pallas_call(
        kernel,
        grid=(ng,),
        in_specs=[
            pl.BlockSpec((1, width, sub, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sub, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sub, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows_pp, 8, h2 * 2 * LANES),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ng, rows_pp, 8, h2 * 2 * LANES),
                                       jnp.int32),
    )(rows_g, init_g, pair_g)


@partial(jax.jit, static_argnames=("T", "H", "W"))
def strips_to_images(out, T, H, W):
    # out (ng, rows_pp, 8, W//4): already image-ordered; crop + bitcast only
    img32 = out.reshape(-1, W // 4)[: T * H].reshape(T, H, W // 4)
    return jax.lax.bitcast_convert_type(img32, jnp.uint8).reshape(T, H, W)


def main():
    T, H, W_px = 30, 1536, 2048
    rng = np.random.default_rng(0)
    yy, xx = np.meshgrid(np.arange(H), np.arange(W_px), indexing="ij")
    frames = np.stack([
        np.clip(96 + 80 * np.sin((xx + 3 * i) / 97.0) * np.cos(yy / 71.0)
                + rng.normal(0, 3.0, (H, W_px)), 0, 255).astype(np.uint8)
        for i in range(T)])
    cfg = CodecConfig(backend="pallas")
    enc = frame_stream.encode_frames_shared(frames, cfg)

    meta, words, offsets, width = decode_pallas.prepare_stream(enc)
    # h-major feed permutation: (ng, rows_pp, h2, 128) -> (ng, h2, rows_pp, 128)
    g, h2 = 8, 2
    sub = g * SUBLANES
    rows_pp = sub // h2
    nbb = offsets.size
    ngp = nbb // (sub * LANES)
    offs_p = offsets.reshape(ngp, rows_pp, h2, LANES).transpose(0, 2, 1, 3).reshape(nbb)
    rows, init, nb = decode_pallas.tile_layout_jax(
        jnp.asarray(words), jnp.asarray(offs_p), width)
    rows = jax.device_put(rows)
    init = jax.device_put(init)
    pair = jax.device_put(jnp.asarray(meta.pair_table))

    def bar(x):
        return float(jnp.sum(x[..., :1, :1].astype(jnp.int32)))

    @partial(jax.jit, static_argnames=())
    def full(r_, i_):
        o = decode_strips(r_, i_, pair, width=width, bounds=meta.bounds,
                          adj_inc=meta.adj_inc)
        return strips_to_images(o, T, H, W_px)

    r = full(rows, init)
    ok = np.array_equal(np.asarray(r), frames)
    print("strips correct:", ok)
    bar(r)
    t0 = time.perf_counter(); iters = 20
    for _ in range(iters):
        r = full(rows, init)
    bar(r)
    dt = (time.perf_counter() - t0) / iters
    print(f"strips full: {dt*1e3:8.3f} ms  {frames.size/dt/1e9:6.2f} GB/s")

    # kernel-only timing
    k = jax.jit(lambda r_, i_: decode_strips(r_, i_, pair, width=width,
                                             bounds=meta.bounds,
                                             adj_inc=meta.adj_inc))
    o = k(rows, init); bar(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = k(rows, init)
    bar(o)
    dt = (time.perf_counter() - t0) / iters
    print(f"strips kernel-only: {dt*1e3:8.3f} ms  {frames.size/dt/1e9:6.2f} GB/s")


if __name__ == "__main__":
    main()
