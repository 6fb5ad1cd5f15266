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


def make_kernel_v2(width, bounds, inc, variant="full", sub=SUBLANES):
    bounds = [int(b) for b in bounds]
    inc = [int(v) for v in inc]
    # active-length pruning: drop compares whose bound is 0 (always true,
    # folded into the base) or >= 65536 (always false).
    base_w = 1
    base_adj = inc[0]
    terms = []  # (bound, w_inc=1, adj_inc)
    for L in range(2, 17):
        b = bounds[L - 1]
        if b == 0:
            base_w += 1
            base_adj += inc[L - 1]
        elif b < (1 << 16):
            terms.append((b, inc[L - 1]))

    def kernel(rows_ref, init_ref, pair_ref, out_ref):
        rows = rows_ref[0]
        pair_tab = pair_ref[:]
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (width, sub, LANES), 0)

        def fetch(wi):
            oh = iota_w == wi[None]
            return jnp.sum(jnp.where(oh, rows, 0), axis=0)

        # shared one-hot: one compare drives three statically-shifted views
        iota_w2 = jax.lax.broadcasted_iota(jnp.int32, (width - 2, sub, LANES), 0)
        rows_a = rows[: width - 2]
        rows_b = rows[1 : width - 1]
        rows_c = rows[2:width]

        def fetch3(wi):
            oh = iota_w2 == wi[None]
            w0 = jnp.sum(jnp.where(oh, rows_a, 0), axis=0)
            w1 = jnp.sum(jnp.where(oh, rows_b, 0), axis=0)
            w2 = jnp.sum(jnp.where(oh, rows_c, 0), axis=0)
            return w0, w1, w2

        def outer(j, carry):
            bits, prev = carry
            wi = jax.lax.shift_right_logical(bits, 5)
            s = bits & 31
            if variant == "nofetch":
                w0, w1, w2 = rows[0], rows[1], rows[2]
            elif variant == "shared3":
                w0, w1, w2 = fetch3(wi)
            else:
                w0 = fetch(wi)
                w1 = fetch(wi + 1)
                w2 = fetch(wi + 2)
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
                if variant in ("pruned", "nofetch", "nogather", "shared3"):
                    w = jnp.full_like(window, base_w)
                    adj = jnp.full_like(window, base_adj)
                    for b, ai in terms:
                        m = (window >= b).astype(jnp.int32)
                        w = w + m
                        if ai != 0:
                            adj = adj + m * ai
                else:
                    w = jnp.ones_like(window)
                    adj = jnp.full_like(window, inc[0])
                    for L in range(2, 17):
                        m = (window >= bounds[L - 1]).astype(jnp.int32)
                        w = w + m
                        if inc[L - 1] != 0:
                            adj = adj + m * inc[L - 1]
                idx = adj + jax.lax.shift_right_logical(window, 16 - w)
                if variant == "nogather":
                    sym = idx & 0xFF
                else:
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
        prev0 = jnp.zeros((sub, LANES), jnp.int32)
        carry = (bits0, prev0)
        for j in range(16):
            carry = outer(j, carry)

    return kernel


@partial(jax.jit, static_argnames=("width", "bounds", "inc", "variant", "g"))
def decode_v2(rows_tiled, init_tiled, pair_vreg, *, width, bounds, inc, variant,
              g=1):
    nt = rows_tiled.shape[0]
    # Interleave g tiles per program: (nt,W,8,128) -> (nt/g, W, g*8, 128).
    # Each program then carries g independent dependency chains, hiding
    # VPU op latency (the decode chain is otherwise fully serial).
    ng = nt // g
    rows_g = rows_tiled.reshape(ng, g, width, SUBLANES, LANES).transpose(
        0, 2, 1, 3, 4).reshape(ng, width, g * SUBLANES, LANES)
    init_g = init_tiled.reshape(ng, g * SUBLANES, LANES)
    pair_g = jnp.tile(pair_vreg, (g, 1))
    sub = g * SUBLANES
    kernel = make_kernel_v2(width, bounds, inc, variant, sub)
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
        out_specs=pl.BlockSpec((1, 16, sub, LANES), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ng, 16, sub, LANES), jnp.int32),
    )(rows_g, init_g, pair_g)


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

    ref = payload.reshape(-1, 64)
    expected = np.asarray(
        np.cumsum(ref, axis=1, dtype=np.int64) % 256).astype(np.uint8)

    bounds, inc, pair = canonical_meta_v2(enc.widths)
    pair_d = jax.device_put(jnp.asarray(pair))
    iters = 20
    # distinct input copies per call defeat any execution memoization in the
    # remote-execute relay (init offsets rotated by tile; results differ).
    inits = [jax.device_put(jnp.roll(init, k, axis=0)) for k in range(iters)]
    rowss = [jax.device_put(jnp.roll(rows, k, axis=0)) for k in range(iters)]
    for variant, g in (("pruned", 8), ("shared3", 4), ("shared3", 8),
                       ("shared3", 16), ("nofetch", 8)):
        f2 = lambda r_, i_: decode_v2(r_, i_, pair_d, width=width,
                                      bounds=tuple(bounds), inc=tuple(inc),
                                      variant=variant, g=g)
        r2 = f2(rows, init)
        _ = float(jnp.sum(r2))  # true completion barrier: host fetch
        t0 = time.perf_counter()
        for k in range(iters): r2 = f2(rowss[k], inits[k])
        _ = float(jnp.sum(r2))
        dt = (time.perf_counter() - t0) / iters
        print(f"v2 {variant:10s} g={g}: {dt*1e3:8.3f} ms  {payload_bytes/dt/1e9:6.2f} GB/s")
        if variant in ("full", "pruned", "shared3"):
            blk2 = np.asarray(jax.jit(lambda o: unpack_to_blocks(o, nb))(f2(rows, init)))
            print(f"   correct: {np.array_equal(blk2, expected)}")


if __name__ == "__main__":
    main()
