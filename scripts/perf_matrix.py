"""Reproducible performance matrix: backends x content types.

    python scripts/perf_matrix.py [--frames 30] [--iters 20]

Measures decode throughput (bit-exact gated) for:
  - Pallas TPU kernel, shared-table video batch (the headline path)
  - multithreaded C++ host decoder
on synthetic photo-like content and, if readable, the reference BigBridge
asset's statistics. Prints a markdown table to stdout.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import synthetic_frame
    from metalhuffman_tpu import native
    from metalhuffman_tpu.models import CodecConfig, frame_stream

    def barrier(x):
        return float(jnp.sum(x[..., :1, :1].astype(jnp.int32)))

    contents = {
        "synthetic photo-like": np.stack([
            synthetic_frame(1536, 2048, seed=0, phase=i)
            for i in range(args.frames)
        ])
    }
    bb = "/root/reference/Shared/BigBridge.png"
    if os.path.exists(bb):
        try:
            from PIL import Image

            img = np.asarray(Image.open(bb).convert("L"))
            contents["BigBridge statistics"] = np.repeat(
                img[None], args.frames, axis=0)
        except Exception:
            pass

    cfg = CodecConfig(backend="pallas")
    rows = []
    for name, frames in contents.items():
        T, H, W = frames.shape
        stream = frame_stream.encode_frames_shared(frames, cfg)
        ratio = stream.compressed_size / frames.size

        # device kernel (shared batch, raw strips)
        prep = frame_stream.prepare_shared(stream, T, H, W, cfg)
        r = frame_stream.decode_shared_step(prep, cfg, raw=bool(prep.h2))
        if prep.h2:
            out = frame_stream.frames_from_raw(r, T, H, W)
        else:
            out = np.asarray(r)
        assert np.array_equal(out, frames), f"{name}: device mismatch"
        barrier(r)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                r = frame_stream.decode_shared_step(prep, cfg, raw=bool(prep.h2))
            barrier(r)
            best = min(best, (time.perf_counter() - t0) / args.iters)
        rows.append((name, "Pallas TPU kernel", ratio, frames.size / best / 1e9))

        # host C++ decoder
        t0 = time.perf_counter()
        blk = native.decode_blocks(stream, delta=cfg.delta)
        dt = time.perf_counter() - t0
        exp = frames.reshape(T, H // 8, 8, W // 8, 8).transpose(
            0, 1, 3, 2, 4).reshape(-1, 64)
        assert np.array_equal(blk, exp), f"{name}: host mismatch"
        rows.append((name, "C++ host (4 cores)", ratio, frames.size / dt / 1e9))

    dev = jax.devices()[0].device_kind
    print(f"\n## Decode throughput ({args.frames}x1536x2048, device={dev})\n")
    print("| content | path | compressed | GB/s | vs 0.094 GB/s target |")
    print("|---|---|---|---|---|")
    for name, path, ratio, gbps in rows:
        print(f"| {name} | {path} | {ratio:.1%} | {gbps:.2f} | {gbps/0.094:.0f}x |")


if __name__ == "__main__":
    main()
