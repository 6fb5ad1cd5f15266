"""Headline benchmark: single-chip TPU Huffman decode throughput.

Decodes a 30-frame 2048x1536 8-bit grayscale video batch (the reference's
motivating workload: full-screen iPad video, ``README.md:9-11``; each frame is
the BigBridge.png geometry — 49,152 8x8 blocks,
``Shared/HuffRenderFrame.m:593-613``) with the Pallas TPU kernel in a single
fused dispatch (shared canonical table across frames) and reports decoded GB/s.
``--content photo`` uses the committed real-photo asset (panned per frame)
instead of synthetic content.

Baseline: the reference's stated target is 2048x1536 @ 30 FPS on an iPad GPU
== 0.094 GB/s decoded bytes (``README.md:11``, BASELINE.md). ``vs_baseline``
is the multiple of that target.

Measurement methodology (PERF.md): (1) completion barrier = host fetch of a
dependent reduction (``block_until_ready`` alone under-reports through the
remote-execution relay); (2) DISTINCT INPUTS PER ITERATION — the timed loop
round-robins several independently staged input batches (frame-order
rotations: identical symbol multiset => one compiled kernel, but different
bitstreams in different device buffers), because chained identical dispatches
can be elided upstream, producing impossible numbers. The same-input rate and
a per-dispatch latency histogram go to stderr as diagnostics; the reported
number is the varied-input rate.

Prints exactly ONE JSON line on stdout:
    {"metric": "decode_throughput", "value": N, "unit": "GB/s",
     "vs_baseline": N, "reps": R, "spread_pct": S}
``value`` is the MEDIAN of R timed repetitions and ``spread_pct`` is
(max-min)/median across them — the per-rep list goes to stderr. Movement
between rounds smaller than the spread is box noise, not a regression.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

BASELINE_GBPS = 0.094  # 2048*1536 bytes * 30 FPS (reference target)


def synthetic_frame(h: int, w: int, seed: int = 0, phase: int = 0) -> np.ndarray:
    """Smooth gradients + mild noise: delta+Huffman compresses this like a
    natural photo (~55%), matching the reference's real-image workload."""
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    base = 96 + 80 * np.sin((xx + 3 * phase) / 97.0) * np.cos(yy / 71.0) + xx * 0.01
    img = base + rng.normal(0, 3.0, (h, w))
    return np.clip(img, 0, 255).astype(np.uint8)


def _barrier(x):
    """True completion barrier: host fetch of a dependent scalar."""
    import jax.numpy as jnp

    return float(jnp.sum(x[..., :1, :1].astype(jnp.int32)))


def photo_frames(height: int, width: int, frames: int) -> np.ndarray:
    """(T, H, W) real photographic frames: the committed bridge asset, tiled
    to the requested geometry and panned 8 px/frame (content statistics stay
    photographic; every frame's bitstream differs)."""
    from metalhuffman_tpu.utils import fixtures

    img = fixtures.render_frame("bridge")
    reps = (-(-height // img.shape[0]), -(-width // img.shape[1]))
    img = np.tile(img, reps)[:height, :width]
    return np.stack(
        [np.roll(img, (8 * t, 8 * t), axis=(0, 1)) for t in range(frames)]
    )


def run_video(height: int, width: int, frames: int, iters: int, verbose: bool,
              content: str = "synthetic", variants: int = 4,
              precoder: str = "delta"):
    import jax

    from metalhuffman_tpu.models import CodecConfig, frame_stream

    cfg = CodecConfig(backend="pallas", delta2d=precoder == "delta2d")
    if content == "photo":
        base = photo_frames(height, width, frames)
    else:
        base = np.stack(
            [synthetic_frame(height, width, seed=0, phase=i)
             for i in range(frames)]
        )
    # Distinct input batches for the timed loop: frame-order rotations give
    # an identical symbol multiset (same canonical table => same kernel
    # constants, ONE compiled executable) but different bitstreams staged in
    # different device buffers — so no two consecutive dispatches are
    # upstream-elidable as identical.
    variants = max(1, min(variants, frames))
    batches = [np.roll(base, v, axis=0) for v in range(variants)]
    t0 = time.perf_counter()
    streams = [frame_stream.encode_frames_shared(b, cfg) for b in batches]
    t_enc = time.perf_counter() - t0

    preps = [frame_stream.prepare_shared(s, frames, height, width, cfg)
             for s in streams]
    p0 = preps[0]
    h2 = p0.h2
    if h2:
        # production path: kernel emits image layout (delta2d reconstructs
        # in kernel registers); bytes are a free host view
        decodes = [
            (lambda p=p: frame_stream.decode_shared_step(p, cfg, raw=True))
            for p in preps]
        to_img = lambda r: frame_stream.frames_from_raw(
            r, frames, height, width, w_pad=p0.w_pad, bh=p0.bh)
    else:
        decodes = [(lambda p=p: frame_stream.decode_shared_step(p, cfg))
                   for p in preps]
        to_img = np.asarray
    for v, (d, b) in enumerate(zip(decodes, batches)):
        out = to_img(d())
        if not np.array_equal(out, b):
            print(
                f"FATAL: decode mismatch on variant {v} "
                f"({int((out != b).sum())} bytes)",
                file=sys.stderr,
            )
            sys.exit(1)

    for d in decodes:  # warmup + ensure staging complete
        _barrier(d())

    def timed_loop(seq, reps: int = 5) -> list[float]:
        """Wall time of EACH of ``reps`` runs over the dispatch sequence.

        All reps are returned (not best-of): this box has a documented
        10-15% run-to-run noise floor (PERF.md), so the graded number is
        the MEDIAN and the JSON carries the spread — round-over-round
        movement inside the spread is noise, outside it is real.
        """
        times = []
        for _rep in range(reps):
            t0 = time.perf_counter()
            r = None
            for d in seq:
                r = d()
            _barrier(r)
            times.append(time.perf_counter() - t0)
        return times

    # headline: round-robin the distinct batches (elision-proof)
    times = timed_loop([decodes[i % variants] for i in range(iters)])
    rates = sorted(base.size * iters / t / 1e9 for t in times)
    gbps = rates[len(rates) // 2]  # median
    spread_pct = 100.0 * (rates[-1] - rates[0]) / gbps if gbps else 0.0
    dt = sorted(times)[len(times) // 2]
    print(f"per-rep GB/s (n={len(rates)}): "
          + " ".join(f"{r:.2f}" for r in rates)
          + f"  median={gbps:.2f} spread={spread_pct:.1f}%", file=sys.stderr)
    # diagnostic: the legacy same-input loop (elision-prone; if this runs
    # far faster than the varied loop, upstream caching is interfering)
    dt_same = min(timed_loop([decodes[0]] * iters, reps=3))
    gbps_same = base.size * iters / dt_same / 1e9

    if verbose:
        # per-dispatch latency distribution (each sample barriered; includes
        # ~1 relay round-trip of overhead per sample — diagnostic only)
        lat = []
        for i in range(3 * variants):
            t0 = time.perf_counter()
            _barrier(decodes[i % variants]())
            lat.append((time.perf_counter() - t0) * 1e3)
        lat.sort()
        ratio = streams[0].compressed_size / base.size
        per_frame = dt / iters / frames * 1e3
        agree = gbps / gbps_same if gbps_same else float("nan")
        print(
            f"device={jax.devices()[0].device_kind} frames={frames} "
            f"frame={height}x{width} iters={iters} content={content} "
            f"variants={variants} precoder={precoder}\n"
            f"encode(host)={t_enc:.2f} s for {variants}x{base.size/1e6:.0f} MB  "
            f"compressed={streams[0].compressed_size} B ({ratio:.1%})\n"
            f"decode={per_frame:.3f} ms/frame  varied={gbps:.2f} GB/s  "
            f"same-input={gbps_same:.2f} GB/s (ratio {agree:.2f})  "
            f"({gbps*1e9/(height*width):.0f} FPS-equivalent)\n"
            f"per-dispatch ms (barriered, n={len(lat)}): "
            f"min={lat[0]:.2f} p50={lat[len(lat)//2]:.2f} max={lat[-1]:.2f}",
            file=sys.stderr,
        )
    return gbps, len(rates), spread_pct


def run_temporal(height: int, width: int, frames: int, iters: int,
                 verbose: bool, content: str = "synthetic",
                 variants: int = 4, keyint: int = 8):
    """Temporal (MHVT) decode throughput: kernel decode + ON-DEVICE fold.

    The production MHVT path (``models.temporal._decode_temporal_device``):
    the Pallas kernel emits raw packed image words, a fori-loop of
    single-slot SWAR adds reconstructs the keyint groups in place, and the host
    views bytes for free — one fused jit program per dispatch. The stderr
    diagnostic reports the plain (fold-less) rate from the same staged
    inputs so the fold's cost is measured, not guessed (VERDICT round-2
    target: within ~2x of plain video decode).
    """
    from functools import partial

    import jax

    from metalhuffman_tpu.models import CodecConfig, frame_stream, temporal

    cfg = CodecConfig(backend="pallas")
    if content == "photo":
        base = photo_frames(height, width, frames)
    else:
        base = np.stack(
            [synthetic_frame(height, width, seed=0, phase=i)
             for i in range(frames)])
    res = temporal.temporal_encode(base, keyint)
    variants = max(1, min(variants, frames))
    batches = [np.roll(res, v, axis=0) for v in range(variants)]
    t0 = time.perf_counter()
    streams = [frame_stream.encode_frames_shared(b, cfg) for b in batches]
    t_enc = time.perf_counter() - t0
    preps = [frame_stream.prepare_shared(s, frames, height, width, cfg)
             for s in streams]
    p0 = preps[0]
    if not p0.h2:
        print("FATAL: temporal bench needs the image-layout kernel path",
              file=sys.stderr)
        sys.exit(1)
    interpret = jax.default_backend() in ("cpu", "gpu")
    rows_pf, wpw, w_pad = p0.bh * 8, p0.w_pad // 4, p0.w_pad

    @partial(jax.jit, static_argnames=(
        "bounds", "adj_inc", "wpr", "h2", "g", "interp", "fold"))
    def step(rows, init, pair, *, bounds, adj_inc, wpr, h2, g, interp, fold):
        strips = frame_stream._decode_shared_strips_jit(
            rows, init, pair, bounds=bounds, adj_inc=adj_inc, wpr=wpr,
            h2=h2, delta=True, interpret=interp, group_tiles=g)
        x = strips.reshape(-1, wpw)[: frames * rows_pf]
        if not fold:
            return x
        return temporal.temporal_fold_words_jax(
            x.reshape(frames, rows_pf, wpw), keyint)

    def make(p, fold):
        return lambda: step(
            p.rows, p.init, p.pair, bounds=p.bounds, adj_inc=p.adj_inc,
            wpr=p.wpr, h2=p.h2, g=p.group_tiles, interp=interpret, fold=fold)

    decodes = [make(p, True) for p in preps]
    plains = [make(p, False) for p in preps]
    for v, (d, b) in enumerate(zip(decodes, batches)):
        out = np.asarray(d()).view(np.uint8).reshape(frames, rows_pf, w_pad)
        want = temporal.temporal_decode(b, keyint)
        if not np.array_equal(out[:, :height, :width], want):
            print(f"FATAL: temporal decode mismatch on variant {v}",
                  file=sys.stderr)
            sys.exit(1)
        if v == 0 and not np.array_equal(out[:, :height, :width], base):
            print("FATAL: variant 0 does not reconstruct the source",
                  file=sys.stderr)
            sys.exit(1)
    for d in plains + decodes:
        _barrier(d())

    def timed(seq, reps=5):
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            r = None
            for d in seq:
                r = d()
            _barrier(r)
            times.append(time.perf_counter() - t0)
        return times

    rates = sorted(base.size * iters / t / 1e9
                   for t in timed([decodes[i % variants] for i in range(iters)]))
    gbps = rates[len(rates) // 2]
    spread = 100.0 * (rates[-1] - rates[0]) / gbps if gbps else 0.0
    plain_rates = sorted(
        base.size * iters / t / 1e9
        for t in timed([plains[i % variants] for i in range(iters)], reps=3))
    plain_gbps = plain_rates[len(plain_rates) // 2]
    print(f"per-rep GB/s (n={len(rates)}): "
          + " ".join(f"{r:.2f}" for r in rates)
          + f"  median={gbps:.2f} spread={spread:.1f}%", file=sys.stderr)
    if verbose:
        ratio = streams[0].compressed_size / base.size
        print(
            f"device={jax.devices()[0].device_kind} frames={frames} "
            f"frame={height}x{width} keyint={keyint} content={content}\n"
            f"encode(host)={t_enc:.2f} s  "
            f"compressed={streams[0].compressed_size} B ({ratio:.1%})\n"
            f"MHVT decode+fold={gbps:.2f} GB/s  plain decode={plain_gbps:.2f} "
            f"GB/s  fold cost={plain_gbps/gbps:.2f}x",
            file=sys.stderr,
        )
    return gbps, len(rates), spread


def run_temporal_ext(height: int, width: int, frames: int, iters: int,
                     verbose: bool, content: str = "synthetic",
                     variants: int = 4, keyint: int = 8,
                     motion: bool = False, inner: str = "gray"):
    """Temporal decode+fold throughput: the MC / color / u16 fold chains.

    ``run_temporal`` covers the plain-grayscale production path (raw packed
    words + SWAR group fold). This covers the OTHER chains
    ``models.temporal._decode_temporal_device`` takes, with the same
    methodology (distinct staged inputs, dependent-reduction barrier,
    median of reps):

    Since round 5 every chain runs the words-domain production path:

    - ``motion=True`` (gray): raw packed strips + the packed-words MC fold
      (``temporal_fold_words_mc_jax`` — row/word rolls + byte rotate +
      SWAR add; padded geometries via the double-roll + byte-mask select);
    - ``inner="color"``: plane-words group fold
      (``temporal_fold_plane_words_jax``) + the word-domain channel
      interleave (``_interleave_words_jax`` — the host view of the output
      words IS the (T, H, W, C) frames);
    - ``inner="u16"``: hi/lo carry fold (``temporal_fold_u16_words_jax``)
      + word-domain LE interleave (host view = u16 frames);
    - ``motion=True`` + ``inner="color"``: per-plane MC rolls in the same
      words fold, then the interleave.

    The stderr diagnostic reports the plain (fold-less) strips-decode
    rate from the same staged inputs, so the printed cost factor isolates
    the reconstruction chain. Decoded bytes are TRUE-frame bytes
    (``base.nbytes``) — for color/u16 the plane payload is the same size.
    """
    from functools import partial

    import jax
    import jax.numpy as jnp

    from metalhuffman_tpu.models import (CodecConfig, color, frame_stream,
                                         temporal)

    cfg = CodecConfig(backend="pallas")
    if content == "photo":
        gray = photo_frames(height, width, frames)
    else:
        gray = np.stack([synthetic_frame(height, width, seed=0, phase=i)
                         for i in range(frames)])
    if inner == "color":
        # correlated channels (column-shifted copies): compresses like a
        # natural RGB photo under the identity colorspace
        base = np.stack([np.roll(gray, 3 * c, axis=2) for c in range(3)],
                        axis=-1)
        channels, kind = 3, color.KIND_U8
    elif inner == "u16":
        # depth-map-like: smooth content scaled past 8 bits (hi plane keeps
        # the gradient statistics, lo plane the fine detail)
        base = ((gray.astype(np.uint16) << 4) | (gray >> 4)).astype(np.uint16)
        channels, kind = 2, color.KIND_U16
    else:
        base = gray
        channels, kind = 1, color.KIND_U8

    variants = max(1, min(variants, frames))
    sets = []
    t0 = time.perf_counter()
    for v in range(variants):
        fr = np.roll(base, v, axis=0)
        if motion:
            res, mvs = temporal.temporal_encode_mc(fr, keyint)
        else:
            res, mvs = temporal.temporal_encode(fr, keyint), None
        if inner == "color":
            planes = res.transpose(0, 3, 1, 2).reshape(-1, height, width)
        elif inner == "u16":
            planes = np.stack([(res >> 8).astype(np.uint8),
                               (res & 0xFF).astype(np.uint8)],
                              axis=1).reshape(-1, height, width)
        else:
            planes = res
        stream = frame_stream.encode_frames_shared(planes, cfg)
        prep = frame_stream.prepare_shared(
            stream, planes.shape[0], height, width, cfg)
        sets.append((fr, stream, prep,
                     None if mvs is None else jnp.asarray(mvs, jnp.int32)))
        print(f"variant {v} encoded+staged "
              f"({time.perf_counter() - t0:.0f} s)", file=sys.stderr)
    t_enc = time.perf_counter() - t0
    p0 = sets[0][2]
    if not p0.h2:
        print("FATAL: temporal bench needs the image-layout kernel path",
              file=sys.stderr)
        sys.exit(1)
    interpret = jax.default_backend() in ("cpu", "gpu")
    rows_pf, wpw = p0.bh * 8, p0.w_pad // 4
    ppf = 2 if inner == "u16" else (3 if inner == "color" else 1)
    n_planes = frames * ppf

    @partial(jax.jit, static_argnames=(
        "bounds", "adj_inc", "wpr", "h2", "g", "interp", "fold"))
    def step(rows, init, pair, mv, *, bounds, adj_inc, wpr, h2, g, interp,
             fold):
        # the round-5 production chain for EVERY kind: raw packed strips
        # from the kernel -> SWAR word fold (plane-major for color, carry
        # pairs for u16, double-roll padded MC) -> one device relayout
        # for color/u16 (gray words are a free host byte view)
        strips = frame_stream._decode_shared_strips_jit(
            rows, init, pair, bounds=bounds, adj_inc=adj_inc, wpr=wpr,
            h2=h2, delta=True, interpret=interp, group_tiles=g)
        x = strips.reshape(-1, wpw)[: n_planes * rows_pf]
        x = x.reshape(n_planes, rows_pf, wpw)
        if not fold:
            return x
        if motion:
            folded = temporal.temporal_fold_words_mc_jax(
                x, keyint, mv, height=height, width=width,
                planes_per_frame=ppf, carry_u16=inner == "u16")
        elif inner == "u16":
            folded = temporal.temporal_fold_u16_words_jax(x, keyint)
        elif inner == "color":
            folded = temporal.temporal_fold_plane_words_jax(x, keyint, ppf)
        else:
            folded = temporal.temporal_fold_words_jax(x, keyint)
        if inner == "gray":
            return folded
        # production relayout: word-domain channel interleave (the host
        # view of the fetched words IS the frame bytes / u16 pixels)
        return temporal._interleave_words_jax(
            folded, channels=(2 if inner == "u16" else channels),
            u16=inner == "u16", cs=color.CS_IDENTITY)

    def make(s, fold):
        _fr, _st, p, mv = s
        return lambda: step(
            p.rows, p.init, p.pair, mv, bounds=p.bounds, adj_inc=p.adj_inc,
            wpr=p.wpr, h2=p.h2, g=p.group_tiles, interp=interpret, fold=fold)

    decodes = [make(s, True) for s in sets]
    plains = [make(s, False) for s in sets]
    label = inner + ("+mc" if motion else "")
    for v, (s, d) in enumerate(zip(sets, decodes)):
        t0 = time.perf_counter()
        out = np.asarray(d())
        if inner == "gray":
            # gray production output is packed words; the host byte view
            # is free (exactly what _decode_temporal_device fetches)
            out = out.view(np.uint8).reshape(
                frames, rows_pf, p0.w_pad)[:, :height, :width]
        elif inner == "u16":
            out = out.view("<u2").reshape(
                frames, rows_pf, p0.w_pad)[:, :height, :width]
        else:
            out = out.view(np.uint8).reshape(
                frames, rows_pf, p0.w_pad, channels)[:, :height, :width, :]
        print(f"variant {v} first decode+fold+fetch "
              f"{time.perf_counter() - t0:.0f} s", file=sys.stderr)
        if not np.array_equal(out, s[0]):
            print(f"FATAL: temporal[{label}] decode mismatch on variant {v}",
                  file=sys.stderr)
            sys.exit(1)
    for d in plains + decodes:
        _barrier(d())

    def timed(seq, reps=5):
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            r = None
            for d in seq:
                r = d()
            _barrier(r)
            times.append(time.perf_counter() - t0)
        return times

    rates = sorted(
        base.nbytes * iters / t / 1e9
        for t in timed([decodes[i % variants] for i in range(iters)]))
    gbps = rates[len(rates) // 2]
    spread = 100.0 * (rates[-1] - rates[0]) / gbps if gbps else 0.0
    plain_rates = sorted(
        base.nbytes * iters / t / 1e9
        for t in timed([plains[i % variants] for i in range(iters)], reps=3))
    plain_gbps = plain_rates[len(plain_rates) // 2]
    print(f"per-rep GB/s (n={len(rates)}): "
          + " ".join(f"{r:.2f}" for r in rates)
          + f"  median={gbps:.2f} spread={spread:.1f}%", file=sys.stderr)
    if verbose:
        ratio = sets[0][1].compressed_size / base.nbytes
        moving = ""
        if motion:
            mv0 = np.asarray(sets[0][3])
            moving = f"  moving={int((mv0 != 0).any(axis=1).sum())}/{frames}"
        print(
            f"device={jax.devices()[0].device_kind} frames={frames} "
            f"frame={height}x{width} keyint={keyint} content={content} "
            f"inner={label}{moving}\n"
            f"encode(host)={t_enc:.2f} s  "
            f"compressed={sets[0][1].compressed_size} B ({ratio:.1%})\n"
            f"MHVT[{label}] decode+fold={gbps:.2f} GB/s  plane/byte "
            f"decode={plain_gbps:.2f} GB/s  fold cost="
            f"{plain_gbps / gbps:.2f}x",
            file=sys.stderr,
        )
    return gbps, len(rates), spread


def run_encode(height: int, width: int, frames: int, iters: int,
               verbose: bool, content: str = "synthetic"):
    """Encode benchmark: host MT encoder + the hybrid device path's stages.

    Reports the production end-to-end rate on THIS box (the multithreaded
    C++ encoder; PERF.md explains why the hybrid's transfers are
    relay-bound here) and, as diagnostics, the hybrid stage rates: the
    Pallas stage-1 packing kernel (device-resident timing) and the C++
    stage-2 row merge — the numbers that bound the hybrid on
    directly-attached hardware.
    """
    import jax
    import jax.numpy as jnp

    from metalhuffman_tpu import native
    from metalhuffman_tpu.core import blocks as blocks_mod
    from metalhuffman_tpu.core import delta as delta_mod
    from metalhuffman_tpu.ops import encode_pallas

    if content == "photo":
        base = photo_frames(height, width, frames)
    else:
        base = np.stack([synthetic_frame(height, width, seed=0, phase=i)
                         for i in range(frames)])
    blk = np.concatenate([blocks_mod.image_to_blocks(f) for f in base])
    syms = delta_mod.delta_encode_blocks(blk).reshape(-1)
    payload = syms.size

    # production host path (multithreaded C++): median of 3 reps + spread
    native.encode_symbols(syms)  # warm (lazy lib build)
    host_rates = []
    for _rep in range(3):
        t0 = time.perf_counter()
        for _ in range(max(1, iters // 8)):
            enc = native.encode_symbols(syms)
        host_rates.append(
            payload * max(1, iters // 8) / (time.perf_counter() - t0) / 1e9)
    host_rates.sort()
    host_gbps = host_rates[len(host_rates) // 2]
    host_spread = (100.0 * (host_rates[-1] - host_rates[0]) / host_gbps
                   if host_gbps else 0.0)

    # hybrid stage 1: device packing kernel, device-resident timing with
    # distinct inputs (two symbol rotations; same table/wmax)
    widths = native.code_lengths(np.bincount(syms, minlength=256).astype(np.int64))
    codes = native.canonical_codes(widths)
    bits_pb = (widths[syms].reshape(-1, 64).astype(np.uint32)
               .sum(axis=1, dtype=np.uint32))
    wmax = int(bits_pb.max()) // 32 + 2
    n_blocks = payload // 64
    nb_pad = -(-n_blocks // 1024) * 1024
    codes_pair, widths_pair = encode_pallas.pack_code_tables(widths, codes)
    cp, wp = jnp.asarray(codes_pair), jnp.asarray(widths_pair)
    staged = []
    for roll in (0, 64):
        padded = np.zeros(nb_pad * 64, np.uint8)
        s = np.roll(syms, roll)
        padded[: s.size] = s
        staged.append(encode_pallas._stage_symbols(
            jax.device_put(jnp.asarray(padded)), nt=nb_pad // 1024))
    min_w, max_w = encode_pallas.used_width_band(widths)  # ranged deposit
    outs = [encode_pallas.encode_rows(st, cp, wp, wmax=wmax, min_w=min_w,
                                      max_w=max_w) for st in staged]
    _barrier(outs[-1])
    t0 = time.perf_counter()
    r = None
    for i in range(iters):
        r = encode_pallas.encode_rows(staged[i % 2], cp, wp, wmax=wmax,
                                      min_w=min_w, max_w=max_w)
    _barrier(r)
    stage1_gbps = payload * iters / (time.perf_counter() - t0) / 1e9

    # hybrid stage 2: host row merge (rows fetched once; fetch not timed)
    rows = np.asarray(encode_pallas._rows_block_major(
        outs[0], wmax=wmax, n_blocks=n_blocks)).view(np.uint32)
    native.merge_rows(rows, bits_pb)  # warm
    t0 = time.perf_counter()
    for _ in range(max(1, iters // 8)):
        code, offsets, total_bits = native.merge_rows(rows, bits_pb)
    merge_gbps = payload * max(1, iters // 8) / (time.perf_counter() - t0) / 1e9

    # cross-check: hybrid output byte-identical to the host encoder
    same = (np.array_equal(code, enc.code_bytes)
            and np.array_equal(offsets, enc.block_offsets))
    if not same:
        print("FATAL: hybrid merge differs from host encoder", file=sys.stderr)
        sys.exit(1)

    # end-to-end hybrid on this box (includes relay transfers — see PERF.md)
    t0 = time.perf_counter()
    encode_pallas.encode_symbols_hybrid(syms)
    e2e_gbps = payload / (time.perf_counter() - t0) / 1e9

    if verbose:
        print(
            f"device={jax.devices()[0].device_kind} payload={payload/1e6:.0f} MB "
            f"content={content} wmax={wmax}\n"
            f"host MT encode: {host_gbps:.2f} GB/s (production on this box)\n"
            f"hybrid stage-1 kernel (device-resident): {stage1_gbps:.2f} GB/s\n"
            f"hybrid stage-2 C++ merge: {merge_gbps:.2f} GB/s\n"
            f"hybrid end-to-end incl. relay transfers: {e2e_gbps:.2f} GB/s "
            f"(transfer-bound here; see PERF.md)",
            file=sys.stderr,
        )
    return host_gbps, len(host_rates), host_spread


def run_single(height: int, width: int, backend: str, iters: int, verbose: bool):
    """Per-frame dispatch mode (includes per-dispatch overhead)."""
    import jax

    from metalhuffman_tpu.models import CodecConfig, ImageCodec

    img = synthetic_frame(height, width)
    codec = ImageCodec(CodecConfig(backend=backend))
    stream = codec.encode(img)
    prep = codec.prepare(stream, height, width)
    out = np.asarray(codec.decode_step(prep))
    if not np.array_equal(out, img):
        print("FATAL: decode mismatch", file=sys.stderr)
        sys.exit(1)
    r = codec.decode_step(prep)
    _barrier(r)
    rates = []
    for _rep in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = codec.decode_step(prep)
        _barrier(r)
        dt = time.perf_counter() - t0
        rates.append(height * width * iters / dt / 1e9)
    rates.sort()
    gbps = rates[len(rates) // 2]
    spread = 100.0 * (rates[-1] - rates[0]) / gbps if gbps else 0.0
    if verbose:
        print(
            f"single-frame [{backend}]: "
            f"{height*width*iters/gbps/1e9/iters*1e3:.3f} ms/frame "
            f"{gbps:.2f} GB/s median of {len(rates)} "
            f"(incl. dispatch overhead)",
            file=sys.stderr,
        )
    return gbps, len(rates), spread


def _supervised_main() -> int:
    """Run the benchmark in a child process with a watchdog and one retry.

    The TPU relay in this environment occasionally wedges on a fresh
    compile (minutes-long hangs a in-process caller cannot interrupt);
    supervision makes the round's benchmark record survive one wedge.
    """
    import os
    import subprocess

    env = dict(os.environ, MHT_BENCH_CHILD="1")
    for attempt in range(2):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)] + sys.argv[1:],
                env=env, stdout=subprocess.PIPE, timeout=540,
            )
        except subprocess.TimeoutExpired:
            print(f"bench attempt {attempt + 1} timed out (wedged device?); "
                  f"{'retrying' if attempt == 0 else 'giving up'}",
                  file=sys.stderr)
            continue
        out = proc.stdout.decode()
        if proc.returncode == 0 and out.strip():
            sys.stdout.write(out.splitlines()[-1] + "\n")
            return 0
        print(f"bench attempt {attempt + 1} failed (rc={proc.returncode})",
              file=sys.stderr)
    return 1


def main():
    from metalhuffman_tpu.cli import _enable_compile_cache

    _enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=1536)
    ap.add_argument("--width", type=int, default=2048)
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--iters", type=int, default=25)
    ap.add_argument("--mode", default="video",
                    choices=["video", "single", "encode", "temporal"])
    ap.add_argument("--content", default="synthetic",
                    choices=["synthetic", "photo"],
                    help="photo = committed real-photo asset, panned per frame")
    ap.add_argument("--variants", type=int, default=4,
                    help="distinct staged input batches round-robined in the "
                         "timed loop (elision control; PERF.md)")
    ap.add_argument("--precoder", default="delta",
                    choices=["delta", "delta2d"],
                    help="delta2d = 2-D within-block predictor (mode 3): "
                         "smaller streams, decode pays the on-device "
                         "reconstruction post-pass")
    ap.add_argument("--motion", action="store_true",
                    help="temporal mode: motion-compensated packed-words "
                         "fold (row/word rolls + byte rotate + SWAR add)")
    ap.add_argument("--inner", default="gray",
                    choices=["gray", "color", "u16"],
                    help="temporal mode: inner container kind (color/u16 "
                         "measure the words-domain plane-fold + channel-"
                         "interleave chains)")
    ap.add_argument("--backend", default="pallas", choices=["pallas", "xla"])
    ap.add_argument("-v", "--verbose", action="store_true")
    ap.add_argument("--trace", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of the timed loop")
    args = ap.parse_args()

    if args.trace:
        import jax

        jax.profiler.start_trace(args.trace)

    metric = "decode_throughput"
    if args.mode == "video":
        gbps, reps, spread = run_video(
            args.height, args.width, args.frames, args.iters,
            args.verbose, content=args.content,
            variants=args.variants, precoder=args.precoder)
    elif args.mode == "temporal":
        if args.motion or args.inner != "gray":
            gbps, reps, spread = run_temporal_ext(
                args.height, args.width, args.frames, args.iters,
                args.verbose, content=args.content, variants=args.variants,
                motion=args.motion, inner=args.inner)
            metric = ("temporal_" + ("mc_" if args.motion else "")
                      + (f"{args.inner}_" if args.inner != "gray" else "")
                      + "decode_throughput")
        else:
            gbps, reps, spread = run_temporal(
                args.height, args.width, args.frames, args.iters,
                args.verbose, content=args.content, variants=args.variants)
            metric = "temporal_decode_throughput"
    elif args.mode == "encode":
        gbps, reps, spread = run_encode(
            args.height, args.width, args.frames, args.iters,
            args.verbose, content=args.content)
        metric = "encode_throughput"
    else:
        gbps, reps, spread = run_single(
            args.height, args.width, args.backend, args.iters, args.verbose)
    if args.trace:
        import jax

        jax.profiler.stop_trace()
        print(f"trace written to {args.trace}", file=sys.stderr)
    # value = MEDIAN of `reps` repetitions; spread_pct = (max-min)/median —
    # movement between rounds smaller than the spread is box noise, not a
    # regression (PERF.md documents 10-15% drift on this relay).
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(gbps, 4),
                "unit": "GB/s",
                "vs_baseline": round(gbps / BASELINE_GBPS, 2),
                "reps": reps,
                "spread_pct": round(spread, 1),
            }
        )
    )


if __name__ == "__main__":
    import os

    if os.environ.get("MHT_BENCH_CHILD"):
        main()
    else:
        sys.exit(_supervised_main())
