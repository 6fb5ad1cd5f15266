"""Multi-chip scaling report: sharded decode throughput vs device count.

    python examples/scaling_report.py                 # all visible devices
    python examples/scaling_report.py --cpu-devices 8 # virtual CPU mesh

On a real multi-chip TPU host this reports ICI scaling efficiency of the
XLA sharded decode (BASELINE.md scaling target: >= 80% linear). On a single
chip or CPU it is a functional demonstration — the mechanics (contiguous
block-range sharding, replicated tables) are identical.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_ap = argparse.ArgumentParser()
_ap.add_argument("--cpu-devices", type=int, default=0,
                 help="force a virtual N-device CPU platform")
_args = _ap.parse_args()

import jax

if _args.cpu_devices:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", _args.cpu_devices)
import jax.numpy as jnp
import numpy as np

from metalhuffman_tpu.core import blocks, delta, encode_symbols
from metalhuffman_tpu.ops import decode_xla
from metalhuffman_tpu.parallel import mesh as mesh_mod, shard_decode


def barrier(x) -> float:
    return float(jnp.sum(x[..., :1].astype(jnp.int32)))


def main():
    rng = np.random.default_rng(0)
    img = (np.add.outer(np.arange(2048), np.arange(2048)) % 241).astype(np.uint8)
    img = (img + rng.integers(0, 7, img.shape)).astype(np.uint8)
    blk = blocks.image_to_blocks(img)
    enc = encode_symbols(delta.delta_encode_blocks(blk).ravel(), block_size=64)
    t1, t2 = decode_xla.prepare_tables(enc.widths)
    words, offsets, width = decode_xla.prepare_stream(enc)
    payload = img.size

    n_all = len(jax.devices())
    counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_all]
    base = None
    print(f"platform={jax.default_backend()} devices={n_all} "
          f"payload={payload/1e6:.0f} MB")
    for n in counts:
        mesh = mesh_mod.make_mesh(n)
        args = shard_decode.shard_stream_inputs(
            mesh, jnp.asarray(words), jnp.asarray(offsets.astype(np.int32)),
            jnp.asarray(t1), jnp.asarray(t2))
        fn = lambda: shard_decode.decode_blocks_sharded(
            *args, mesh=mesh, width=width)
        out = fn()
        ok = np.array_equal(np.asarray(out)[: enc.block_offsets.size], blk)
        barrier(out)
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        barrier(out)
        dt = (time.perf_counter() - t0) / iters
        gbps = payload / dt / 1e9
        if base is None:
            base = gbps
        eff = gbps / (base * n) * 100
        print(f"  {n:2d} device(s): {dt*1e3:8.2f} ms  {gbps:7.3f} GB/s  "
              f"scaling {eff:5.1f}%  bit-exact={ok}")


if __name__ == "__main__":
    main()
