"""Temporal fold variant A/B on TPU (decode+fold pipeline, interleaved).

Variants of the device group fold applied to the kernel's raw packed words:
  swar  — associative_scan over the SWAR byte add (production, 3 passes)
  mxu   — lower-triangular int8 matmul per keyint group: bytes reinterpret
          as i8 (sums agree mod 256), tril(keyint) @ group on the MXU,
          int32 accumulate, mask & 0xFF — one read + one write
  loop  — fori over keyint with a running wrapping add (keyint-1 passes
          over 1/keyint of the data each)

Run from /root/repo on the TPU: python scratch/ablate_fold.py
"""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np

import bench
from metalhuffman_tpu.models import CodecConfig, frame_stream, temporal


def fold_mxu(words, keyint: int):
    import jax
    import jax.numpy as jnp

    t = words.shape[0]
    pad = (-t) % keyint
    x = jnp.pad(words, [(0, pad), (0, 0), (0, 0)])
    by = jax.lax.bitcast_convert_type(x, jnp.int8)  # (T, rows, wpw, 4)
    g = x.shape[0] // keyint
    grp = by.reshape(g, keyint, -1)
    tril = jnp.tril(jnp.ones((keyint, keyint), jnp.int8))
    acc = jnp.einsum("ij,gjn->gin", tril, grp,
                     preferred_element_type=jnp.int32)
    out = (acc & 0xFF).astype(jnp.uint8)
    out = jax.lax.bitcast_convert_type(
        out.reshape((g * keyint,) + x.shape[1:] + (4,)), jnp.int32)
    return out[:t]


def fold_loop(words, keyint: int):
    import jax
    import jax.numpy as jnp

    t = words.shape[0]
    pad = (-t) % keyint
    x = jnp.pad(words, [(0, pad), (0, 0), (0, 0)])
    g = x.shape[0] // keyint
    grp = x.reshape((g, keyint) + x.shape[1:])

    def body(i, acc):
        # acc[:, i] += acc[:, i-1] (SWAR)
        prev = jax.lax.dynamic_index_in_dim(acc, i - 1, 1, keepdims=False)
        cur = jax.lax.dynamic_index_in_dim(acc, i, 1, keepdims=False)
        return jax.lax.dynamic_update_index_in_dim(
            acc, temporal._swar_add8(prev, cur), i, 1)

    out = jax.lax.fori_loop(1, keyint, body, grp)
    return out.reshape((-1,) + x.shape[1:])[:t]


def main(frames_n=30, h=1536, w=2048, iters=20, reps=5, keyint=8):
    import jax

    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    base = np.stack([bench.synthetic_frame(h, w, seed=0, phase=i)
                     for i in range(frames_n)])
    res = temporal.temporal_encode(base, keyint)
    cfg = CodecConfig(backend="pallas")
    stream = frame_stream.encode_frames_shared(res, cfg)
    prep = frame_stream.prepare_shared(stream, frames_n, h, w, cfg)
    rows_pf, wpw, w_pad = prep.bh * 8, prep.w_pad // 4, prep.w_pad

    folds = {
        "swar": temporal.temporal_fold_words_jax,
        "mxu": fold_mxu,
        "loop": fold_loop,
    }

    def make(fold_fn):
        @partial(jax.jit, static_argnames=())
        def step(rows, init, pair):
            strips = frame_stream._decode_shared_strips_jit(
                rows, init, pair, bounds=prep.bounds, adj_inc=prep.adj_inc,
                wpr=prep.wpr, h2=prep.h2, delta=True, interpret=False,
                group_tiles=prep.group_tiles)
            x = strips.reshape(-1, wpw)[: frames_n * rows_pf]
            return fold_fn(x.reshape(frames_n, rows_pf, wpw), keyint)

        return lambda: step(prep.rows, prep.init, prep.pair)

    runs = {k: make(f) for k, f in folds.items()}
    for k, r in runs.items():
        out = np.asarray(r()).view(np.uint8).reshape(
            frames_n, rows_pf, w_pad)[:, :h, :w]
        assert np.array_equal(out, base), f"{k} mismatch"
        bench._barrier(r())
    print("all variants bit-exact", file=sys.stderr, flush=True)

    meds = {}
    samples = {k: [] for k in runs}
    for _ in range(reps):
        for k, r in runs.items():  # interleaved
            t0 = time.perf_counter()
            out = None
            for _i in range(iters):
                out = r()
            bench._barrier(out)
            samples[k].append(
                base.size * iters / (time.perf_counter() - t0) / 1e9)
    for k, v in samples.items():
        v.sort()
        meds[k] = v[len(v) // 2]
        print(f"{k}: {meds[k]:.2f} GB/s {['%.1f' % x for x in v]}",
              file=sys.stderr)
    print({k: round(v, 2) for k, v in meds.items()}, flush=True)


if __name__ == "__main__":
    main()
