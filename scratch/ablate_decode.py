"""Kernel-variant ablation harness (single dispatch, distinct inputs).

Variants of the production decode kernel (ops/decode_pallas._make_kernel),
timed on the same staged photo-content workload with the bench.py
methodology (alternating staged inputs + host-fetch barrier). Variants:

  base        — production kernel as shipped
  maxw        — fetch range bounded by the table's max active width
  gatheradj   — width-only compare chain + per-symbol adj gather
                (replaces T constant-muladds with T adds + 1 in-vreg gather)
  g12         — group_tiles=12 (more ILP, more VMEM)
  stride2     — refill one-hot scans EVEN word indices only (wi>>1): half
                the compares, each candidate selects 4 consecutive words,
                parity picks the 3-word window (round-4 roofline study)
  stride4     — same at stride 4 (wi>>2, 6 words/candidate, 4-way parity)

Run: python scratch/ablate_decode.py [variants...]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import bench
from metalhuffman_tpu.models import CodecConfig, frame_stream
from metalhuffman_tpu.ops import decode_pallas as dp

LANES, SUBLANES, SYMS = dp.LANES, dp.SUBLANES, dp.SYMS_PER_GROUP


def make_kernel_variant(width, bounds, adj_inc, *, sub, delta, image_h2,
                        variant):
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
    flags = set(variant.split("+"))
    min_w = base_w
    max_w = base_w + len(terms) if "maxw" in flags else 16
    stride = (2 if "stride2" in flags else
              4 if "stride4" in flags else
              8 if "stride8" in flags else 1)

    # adj(w) lookup for the gatheradj variant: adj = base_adj + prefix sums
    adj_by_w = np.zeros(LANES, np.int32)
    acc = base_adj
    for i, (_, ai) in enumerate(terms):
        acc += ai
        adj_by_w[base_w + 1 + i] = acc
    adj_by_w[base_w] = base_adj
    adj_tab_const = np.tile(adj_by_w[None], (sub, 1))

    def kernel(rows_ref, init_ref, pair_ref, adj_ref, out_ref):
        pair_tab = pair_ref[:]
        adj_tab = adj_ref[:]
        if image_h2:
            lane = jax.lax.broadcasted_iota(jnp.int32, (sub, LANES), 1)
            half_idx = lane >> 1
            parity = (lane & 1) == 1

        def outer(j, carry):
            bits, prev = carry
            wi = jax.lax.shift_right_logical(bits, 5)
            s = bits & 31
            lo = (SYMS * j * min_w) >> 5
            hi = min(width - 3, (31 + max_w * SYMS * j) >> 5)
            lo = min(lo, hi)
            if lo == hi:
                w0 = rows_ref[0, lo]
                w1 = rows_ref[0, lo + 1]
                w2 = rows_ref[0, lo + 2]
            elif stride > 1:
                # stride-S refill: one-hot on wi>>log2(S) — 1/S the
                # compares, each candidate selecting S+2 consecutive
                # words; a (S-1)-level parity select picks the window.
                # Array form: one contiguous slab load + S+2 strided
                # views, so the op count stays O(S) regardless of range
                # (matters for interpret mode and trace size). Words past
                # width-1 are zero-padded: they are only ever SELECTED
                # when wi needs word wi+2 <= width-1, never for legal wi.
                shift = stride.bit_length() - 1
                lo_s, hi_s = lo >> shift, hi >> shift
                n_s = hi_s - lo_s + 1
                wi_s = jax.lax.shift_right_logical(wi, shift)
                iota_s = lo_s + jax.lax.broadcasted_iota(
                    jnp.int32, (n_s, sub, LANES), 0)
                oh = iota_s == wi_s[None]
                # UNROLLED per-candidate form — the +2.8% one; the O(S)-op
                # slab/reshape form lowers but loses the win to shape-cast
                # overhead (measured 17.08 vs 16.95 = noise)
                cand = []
                for d in range(stride + 2):
                    acc = jnp.where(
                        oh[0], rows_ref[0, min(stride * lo_s + d, width - 1)],
                        0)
                    for c in range(1, n_s):
                        acc = acc + jnp.where(
                            oh[c],
                            rows_ref[0, min(stride * (lo_s + c) + d,
                                            width - 1)], 0)
                    cand.append(acc)
                r0 = wi & (stride - 1)
                w0, w1, w2 = cand[0], cand[1], cand[2]
                for r in range(1, stride):
                    sel = r0 >= r
                    w0 = jnp.where(sel, cand[r], w0)
                    w1 = jnp.where(sel, cand[r + 1], w1)
                    w2 = jnp.where(sel, cand[r + 2], w2)
            else:
                n = hi - lo + 1
                iota_g = lo + jax.lax.broadcasted_iota(
                    jnp.int32, (n, sub, LANES), 0)
                oh = iota_g == wi[None]
                w0 = jnp.sum(jnp.where(oh, rows_ref[0, lo : hi + 1], 0), axis=0)
                w1 = jnp.sum(
                    jnp.where(oh, rows_ref[0, lo + 1 : hi + 2], 0), axis=0)
                w2 = jnp.sum(
                    jnp.where(oh, rows_ref[0, lo + 2 : hi + 3], 0), axis=0)
            rs = 31 - s
            W0 = jax.lax.shift_left(w0, s) | jax.lax.shift_right_logical(
                jax.lax.shift_right_logical(w1, 1), rs)
            W1 = jax.lax.shift_left(w1, s) | jax.lax.shift_right_logical(
                jax.lax.shift_right_logical(w2, 1), rs)

            t = jnp.zeros_like(s)
            packed = jnp.zeros_like(s)
            for k in range(SYMS):
                if k == 0:
                    win32 = W0
                else:
                    w_hi = W0 if k == 1 else jnp.where(t < 32, W0, W1)
                    u = t & 31
                    win32 = jax.lax.shift_left(w_hi, u) | \
                        jax.lax.shift_right_logical(
                            jax.lax.shift_right_logical(W1, 1), 31 - u)
                window = jax.lax.shift_right_logical(win32, 16)
                if "gatheradj" in flags:
                    w = jnp.full_like(window, base_w)
                    for b, _ in terms:
                        w = w + (window >= b).astype(jnp.int32)
                    adj = jnp.take_along_axis(adj_tab, w, axis=1)
                else:
                    acc2 = jnp.full_like(
                        window, base_w + ((base_adj + (1 << 16)) << 8))
                    for b, ai in terms:
                        m = (window >= b).astype(jnp.int32)
                        acc2 = acc2 + m * (1 + (ai << 8))
                    w = acc2 & 0xFF
                    adj = jax.lax.shift_right_logical(acc2, 8) - (1 << 16)
                idx = adj + jax.lax.shift_right_logical(window, 16 - w)
                pairv = jnp.take_along_axis(
                    pair_tab, jax.lax.shift_right_logical(idx, 1) & 127,
                    axis=1)
                sym = jnp.where(
                    (idx & 1) == 1,
                    jax.lax.shift_right_logical(pairv, 8), pairv) & 0xFF
                if delta:
                    prev = (prev + sym) & 0xFF
                    out = prev
                else:
                    out = sym
                packed = packed | jax.lax.shift_left(out, 8 * k)
                t = t + w
            return (bits + t, prev), packed

        carry = (init_ref[0], jnp.zeros((sub, LANES), jnp.int32))
        rows_pp = sub // image_h2
        for dy in range(8):
            carry, p0 = outer(2 * dy, carry)
            carry, p1 = outer(2 * dy + 1, carry)
            lo2 = jnp.where(
                parity,
                jnp.take_along_axis(p1, half_idx, axis=1),
                jnp.take_along_axis(p0, half_idx, axis=1))
            hi2 = jnp.where(
                parity,
                jnp.take_along_axis(p1, 64 + half_idx, axis=1),
                jnp.take_along_axis(p0, 64 + half_idx, axis=1))
            for h in range(image_h2):
                sl = slice(h * rows_pp, (h + 1) * rows_pp)
                out_ref[0, :, dy, (2 * h) * LANES:(2 * h + 1) * LANES] = lo2[sl]
                out_ref[0, :, dy,
                        (2 * h + 1) * LANES:(2 * h + 2) * LANES] = hi2[sl]

    return kernel, adj_tab_const


def build_variant(variant, staged, meta, wpr, h2):
    flags = set(variant.split("+"))
    g = 12 if "g12" in flags else (16 if "g16" in flags else 8)
    fns = []
    out0 = None
    for rows_t, init_t in staged:
        nt = rows_t.shape[0]
        gg = g
        while nt % gg:
            gg -= 1  # keep grouping exact for the ablation
        ng = nt // gg
        sub = gg * SUBLANES
        if sub % h2:
            raise SystemExit(f"h2={h2} !| sub={sub}")
        rows_pp = sub // h2
        rows_g = rows_t.reshape(ng, gg, wpr, SUBLANES, LANES).transpose(
            0, 2, 1, 3, 4).reshape(ng, wpr, sub, LANES)
        init_g = init_t.reshape(ng, sub, LANES)
        pair_g = jnp.tile(jnp.asarray(meta.pair_table), (gg, 1))
        kernel, adj_tab = make_kernel_variant(
            wpr, meta.bounds, meta.adj_inc, sub=sub, delta=True,
            image_h2=h2, variant=variant)
        call = pl.pallas_call(
            kernel,
            grid=(ng,),
            in_specs=[
                pl.BlockSpec((1, wpr, sub, LANES), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sub, LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((sub, LANES), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((sub, LANES), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, rows_pp, 8, h2 * 2 * LANES),
                                   lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (ng, rows_pp, 8, h2 * 2 * LANES), jnp.int32),
            interpret=jax.default_backend() in ("cpu", "gpu"),
        )
        fn = jax.jit(call)
        r = fn(rows_g, init_g, pair_g, jnp.asarray(adj_tab))
        if out0 is None:
            out0 = r
        fns.append((fn, rows_g, init_g, pair_g, jnp.asarray(adj_tab)))
    return fns, out0


def barrier(x):
    return float(jnp.sum(x[..., :1, :1].astype(jnp.int32)))


def measure_interleaved(variants, built, payload, rounds=6, per=6):
    best = {v: float("inf") for v in variants}
    for _ in range(rounds):
        for v in variants:
            fns = built[v][0]
            t0 = time.perf_counter()
            r = None
            for i in range(per):
                fn, a, b, c, d = fns[i % len(fns)]
                r = fn(a, b, c, d)
            barrier(r)
            best[v] = min(best[v], (time.perf_counter() - t0) / per)
    for v in variants:
        gbps = payload / best[v] / 1e9
        print(f"{v:22s} {best[v]*1e3:7.2f} ms  {gbps:6.2f} GB/s")


def main():
    import os

    variants = sys.argv[1:] or ["base", "maxw", "gatheradj", "g12"]
    T, H, W = 30, 1536, 2048
    if os.environ.get("MHT_ABL_GEOM"):  # e.g. MHT_ABL_GEOM=1080x1920
        H, W = map(int, os.environ["MHT_ABL_GEOM"].split("x"))
    if jax.default_backend() in ("cpu", "gpu"):
        T, H, W = 3, 64, 1024  # interpret-mode correctness check only
    if os.environ.get("MHT_ABL_CONTENT") == "synthetic":
        base = np.stack([bench.synthetic_frame(H, W, seed=0, phase=i)
                         for i in range(T)])
    else:
        base = bench.photo_frames(H, W, T)
    frames_sets = [base, np.roll(base, 16, axis=2)]
    cfg = CodecConfig(backend="pallas")
    payload = T * H * W
    staged = []
    meta = wpr = None
    for f in frames_sets:
        stream = frame_stream.encode_frames_shared(f, cfg)
        meta, words, offsets, wpr = dp.prepare_stream(stream)
        plan = dp.image_plan_for(H, W, 8)
        offs_pad = dp.pad_offsets_grid(
            jnp.asarray(offsets), T * plan.bh, plan.bw, plan.bw_pad)
        # stage tiles WITHOUT grouping (variants regroup themselves)
        rows, init, _ = dp.tile_layout_images(
            jnp.asarray(words), offs_pad, wpr, plan.h2, group_tiles=8)
        staged.append((jax.device_put(rows), jax.device_put(init)))
    h2 = dp.image_plan_for(H, W, 8).h2
    built = {}
    ref = None
    for v in variants:
        built[v] = build_variant(v, staged, meta, wpr, h2)
        if "g12" in v or "g16" in v:
            continue  # different grouping -> different output layout
        a = np.asarray(built[v][1]).reshape(-1)[:4096]
        if ref is None:
            ref = a
        elif not np.array_equal(ref, a):
            print(f"  !! {v} output mismatch vs base")
    measure_interleaved(variants, built, payload)


if __name__ == "__main__":
    main()
