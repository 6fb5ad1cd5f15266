"""Encode-kernel instruction accounting: the static side of the roofline.

The decode kernel got this treatment in round 4 (scratch/roofline.py, PERF
"The decode roofline, closed"); round-4 verdict weak item 2 asked for the
same discipline on the stage-1 ENCODE kernel (ops/encode_pallas
.make_encode_kernel, the one-hot deposit packer). Same model:

  1 count = one (8,128)-vreg VPU instruction; counted per LANE ELEMENT =
  per block (1024 block-lanes advance per physical instruction).
  add/and/or/compare/select/shift = 1; jnp.take_along_axis lane gather =
  G in {1, 4, 8} (same bracketing as the decode accounting). VMEM
  loads/stores counted separately (different pipe). Peak issue: 4 ALU
  slots x (8,128) @ 1.74 GHz (v5e). "ideal GB/s" = every slot filled —
  an upper bound, not a target.

Kernel structure (per block = per lane element):

  16 groups x [ 4 symbols x (half/odd extract 4, two pair-table gathers
  2G, code/width unpack 6, chunk append: c32 1, sh 1, hi 1, lo 3,
  in_hi 1, C0 2, C1 2, L 1 = 22+2G)
  + deposit (wi/sh 2, d0 1, mid 5, d2 3, t 1 = 12)
  + 9 ops per CANDIDATE word (3 compares vs j/j-1/j-2 + 3 selects
  + 3 ors) ]

The deposit candidate count is the lever this accounting exposes: the
shipped kernel scans ALL wmax words per group (9*wmax*16 per block), but
group g's in-block bit offset t is statically bounded by the table's
min/max symbol widths — t in [4g*min_w, 4g*max_w] — so the deposit only
needs words [t_lo>>5, (t_hi>>5)+2], exactly the static per-group ranges
the decode kernel's refill scan uses. This script prints both variants'
totals on the real bench workloads' canonical tables; the gap is the
predicted win of the ranged-deposit kernel.

Usage: python scratch/roofline_encode.py   (host-only; no TPU needed)
"""

import sys

sys.path.insert(0, ".")

import numpy as np

import bench
from metalhuffman_tpu import native
from metalhuffman_tpu.core import blocks as blocks_mod
from metalhuffman_tpu.core import delta as delta_mod

CLOCK = 1.74e9  # TPU v5e
ALUS = 4        # VPU issue slots per cycle, (8,128) lanes each


def count_block(wmax, min_w, max_w, g_cost, ranged):
    """Per-block (= per lane element) instruction counts, by stage."""
    per_symbol = 22 + 2 * g_cost
    symbol = 16 * 4 * per_symbol
    deposit_fixed = 16 * 12
    candidates = 0
    ranges = []
    for g in range(16):
        if not ranged:
            n = wmax
        else:
            lo = (4 * g * min_w) >> 5
            hi = min(wmax - 1, ((4 * g * max_w) >> 5) + 2)
            n = hi - lo + 1
        ranges.append(n)
        candidates += n
    deposit = deposit_fixed + 9 * candidates
    total = symbol + deposit
    return {"symbol": symbol, "deposit": deposit, "candidates": candidates,
            "total": total, "ranges": ranges,
            "loads": 64, "stores": wmax + 1}


def report(name, frames):
    blk = np.concatenate([blocks_mod.image_to_blocks(f) for f in frames])
    syms = delta_mod.delta_encode_blocks(blk).reshape(-1)
    freqs = np.bincount(syms, minlength=256)
    widths = native.code_lengths(freqs.astype(np.int64))
    used = widths[freqs > 0]
    min_w, max_w = int(used.min()), int(used.max())
    bits_pb = widths[syms].reshape(-1, 64).astype(np.uint32).sum(axis=1)
    wmax = int(bits_pb.max()) // 32 + 2
    print(f"\n== {name}: wmax={wmax} symbol widths {min_w}..{max_w} "
          f"(mean block bits {bits_pb.mean():.0f})")
    for g_cost in (1, 4, 8):
        for ranged in (False, True):
            c = count_block(wmax, min_w, max_w, g_cost, ranged)
            ideal = ALUS * CLOCK * 1024 / c["total"] * 64 / 1e9
            tag = f"G={g_cost} {'ranged' if ranged else 'full':6s}"
            print(f"  {tag:15s} symbol={c['symbol']:5d} "
                  f"deposit={c['deposit']:5d} (cand={c['candidates']:3d}) "
                  f"total={c['total']:5d} ops/block "
                  f"({c['total'] / 64:5.1f}/byte) "
                  f"ideal(4-issue)={ideal:6.1f} GB/s")
    c = count_block(wmax, min_w, max_w, 0, True)
    print(f"  ranged deposit candidates per group: {c['ranges']}")


def main():
    T, H, W = 30, 1536, 2048
    report("photo (bridge, panned)", bench.photo_frames(H, W, T))
    report("synthetic (bench headline)", np.stack(
        [bench.synthetic_frame(H, W, seed=0, phase=i) for i in range(T)]))


if __name__ == "__main__":
    main()
