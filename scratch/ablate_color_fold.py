"""Component ablation of the color/u16 temporal reconstruction chain.

The round-5 packed-words plane folds barely moved the color/u16 numbers
(13.8 -> 13.9, 12.0 -> 12.6 GB/s) while the SAME payload's strips decode
runs 36.7 — so the fold was never the bottleneck. This times each stage
of the chain cumulatively on device (same staging + barrier methodology
as bench.py) to locate the real cost:

  A  strips decode only
  B  A + plane-words group fold (the round-5 SWAR fold)
  C  B + bitcast to bytes + crop          (word -> byte view, pad drop)
  D  C + channel interleave               (T,C,H,W) -> (T,H,W,C) transpose
  E  D + sub-green inverse                (2 wrapping byte adds)
  U  C + u16 recombine ((hi<<8)|lo in u16 lanes)  [u16 staging]
  U2 C + u16 recombine, word-granular SWAR interleave variant

Run on TPU: python scratch/ablate_color_fold.py [color|u16]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

import bench
from metalhuffman_tpu.models import CodecConfig, color, frame_stream, temporal

KEYINT = 8


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial
    from jax import lax

    kind = sys.argv[1] if len(sys.argv) > 1 else "color"
    T, H, W = 30, 1536, 2048
    cfg = CodecConfig(backend="pallas")
    gray = np.stack([bench.synthetic_frame(H, W, seed=0, phase=i)
                     for i in range(T)])
    if kind == "color":
        base = np.stack([np.roll(gray, 3 * c, axis=2) for c in range(3)],
                        axis=-1)
        ppf = 3
    else:
        base = ((gray.astype(np.uint16) << 4) | (gray >> 4)).astype(np.uint16)
        ppf = 2

    sets = []
    for v in range(2):
        fr = np.roll(base, v, axis=0)
        res = temporal.temporal_encode(fr, KEYINT)
        if kind == "color":
            planes = res.transpose(0, 3, 1, 2).reshape(-1, H, W)
        else:
            planes = np.stack([(res >> 8).astype(np.uint8),
                               (res & 0xFF).astype(np.uint8)],
                              axis=1).reshape(-1, H, W)
        stream = frame_stream.encode_frames_shared(planes, cfg)
        prep = frame_stream.prepare_shared(stream, planes.shape[0], H, W, cfg)
        sets.append(prep)
        print(f"staged variant {v}", file=sys.stderr, flush=True)
    p0 = sets[0]
    rows_pf, wpw = p0.bh * 8, p0.w_pad // 4
    n_planes = T * ppf
    interp = jax.default_backend() in ("cpu", "gpu")

    @partial(jax.jit, static_argnames=("bounds", "adj_inc", "wpr", "h2",
                                       "g", "stage"))
    def step(rows, init, pair, *, bounds, adj_inc, wpr, h2, g, stage):
        strips = frame_stream._decode_shared_strips_jit(
            rows, init, pair, bounds=bounds, adj_inc=adj_inc, wpr=wpr,
            h2=h2, delta=True, interpret=interp, group_tiles=g)
        x = strips.reshape(-1, wpw)[: n_planes * rows_pf]
        x = x.reshape(n_planes, rows_pf, wpw)
        if stage == "A":
            return x
        if kind == "color":
            f = temporal.temporal_fold_plane_words_jax(x, KEYINT, ppf)
        else:
            f = temporal.temporal_fold_u16_words_jax(x, KEYINT)
        if stage == "B":
            return f
        b = lax.bitcast_convert_type(f, jnp.uint8).reshape(
            n_planes, rows_pf, wpw * 4)[:, :H, :W]
        if stage == "C":
            return b
        if kind == "u16":
            if stage == "U":
                pairs = b.reshape(T, 2, H, W).astype(jnp.uint16)
                return (pairs[:, 0] << 8) | pairs[:, 1]
            # U2: word-granular interleave — keep everything int32; two
            # output words per (hi, lo) input word pair, pure shifts/ors
            fw = f.reshape(T, 2, rows_pf, wpw)
            hi, lo = fw[:, 0], fw[:, 1]
            sr = lax.shift_right_logical
            a = ((lo & 0xFF) | ((hi & 0xFF) << 8)
                 | ((lo & 0xFF00) << 8) | ((hi & 0xFF00) << 16))
            b2 = ((sr(lo, 16) & 0xFF) | ((sr(hi, 16) & 0xFF) << 8)
                  | ((sr(lo, 24) & 0xFF) << 16) | (sr(hi, 24) << 24))
            out = jnp.stack([a, b2], axis=-1).reshape(T, rows_pf, 2 * wpw)
            return out
        img = b.reshape(T, ppf, H, W).transpose(0, 2, 3, 1)
        if stage == "D":
            return img
        out = img.at[..., 0].set(img[..., 0] + img[..., 1])
        out = out.at[..., 2].set(out[..., 2] + out[..., 1])
        return out

    stages = (["A", "B", "C", "D", "E"] if kind == "color"
              else ["A", "B", "C", "U", "U2"])
    fns = {}
    for s in stages:
        fns[s] = [
            (lambda p=p, s=s: step(p.rows, p.init, p.pair, bounds=p.bounds,
                                   adj_inc=p.adj_inc, wpr=p.wpr, h2=p.h2,
                                   g=p.group_tiles, stage=s))
            for p in sets]
        for f in fns[s]:
            bench._barrier(f())  # compile + warm

    payload = base.nbytes
    for s in stages:
        best = float("inf")
        for _ in range(6):
            t0 = time.perf_counter()
            r = None
            for i in range(6):
                r = fns[s][i % 2]()
            bench._barrier(r)
            best = min(best, (time.perf_counter() - t0) / 6)
        print(f"stage {s}: {best*1e3:7.2f} ms  {payload/best/1e9:6.2f} GB/s",
              flush=True)


if __name__ == "__main__":
    main()
