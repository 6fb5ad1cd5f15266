"""Headline benchmark: single-chip TPU Huffman decode throughput.

Decodes a 2048x1536 8-bit grayscale frame (the reference's BigBridge.png
workload: 49,152 8x8 blocks, ``Shared/HuffRenderFrame.m:593-613``) with the
Pallas TPU kernel and reports decoded GB/s.

Baseline: the reference's stated target is 2048x1536 @ 30 FPS on an iPad GPU
== 0.094 GB/s decoded bytes (``README.md:11``, BASELINE.md). ``vs_baseline``
is the multiple of that target.

Prints exactly ONE JSON line on stdout:
    {"metric": "decode_throughput", "value": N, "unit": "GB/s", "vs_baseline": N}
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

BASELINE_GBPS = 0.094  # 2048*1536 bytes * 30 FPS (reference target)


def synthetic_frame(h: int, w: int, seed: int = 0) -> np.ndarray:
    """Smooth gradients + mild noise: delta+Huffman compresses this like a
    natural photo (~50%), matching the reference's real-image workload."""
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    base = 96 + 80 * np.sin(xx / 97.0) * np.cos(yy / 71.0) + xx * 0.01
    img = base + rng.normal(0, 3.0, (h, w))
    return np.clip(img, 0, 255).astype(np.uint8)


def run(height: int, width: int, backend: str, iters: int, verbose: bool):
    import jax

    from metalhuffman_tpu.models import CodecConfig, ImageCodec

    img = synthetic_frame(height, width)
    codec = ImageCodec(CodecConfig(backend=backend))

    t0 = time.perf_counter()
    stream = codec.encode(img)
    t_enc = time.perf_counter() - t0
    prep = codec.prepare(stream, height, width)

    # Correctness gate first (the reference asserts byte-exactness the same
    # way in its capture path).
    out = np.asarray(codec.decode_step(prep))
    if not np.array_equal(out, img):
        print(
            f"FATAL: decode mismatch ({int((out != img).sum())} bytes)",
            file=sys.stderr,
        )
        sys.exit(1)

    # Warmup (compile already done above) then timed loop.
    for _ in range(3):
        codec.decode_step(prep).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        r = codec.decode_step(prep)
    r.block_until_ready()
    dt = time.perf_counter() - t0

    decoded_bytes = height * width * iters
    gbps = decoded_bytes / dt / 1e9
    if verbose:
        ratio = stream.compressed_size / (height * width)
        print(
            f"device={jax.devices()[0].device_kind} backend={backend} "
            f"frame={height}x{width} iters={iters}\n"
            f"encode(host)={t_enc*1e3:.1f} ms  "
            f"compressed={stream.compressed_size} B ({ratio:.1%})\n"
            f"decode={dt/iters*1e3:.3f} ms/frame  {gbps:.3f} GB/s  "
            f"({gbps*1e9/(height*width):.0f} FPS-equivalent)",
            file=sys.stderr,
        )
    return gbps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=1536)
    ap.add_argument("--width", type=int, default=2048)
    ap.add_argument("--backend", default="pallas", choices=["pallas", "xla"])
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args()

    gbps = run(args.height, args.width, args.backend, args.iters, args.verbose)
    print(
        json.dumps(
            {
                "metric": "decode_throughput",
                "value": round(gbps, 4),
                "unit": "GB/s",
                "vs_baseline": round(gbps / BASELINE_GBPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
