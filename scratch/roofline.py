"""Decode-kernel instruction accounting: the arithmetic behind the roofline.

Counts VPU vector instructions per decoded block for the PRODUCTION kernel
(ops/decode_pallas._make_kernel), specialized exactly the way the kernel
specializes itself (pruned compare terms, static per-group refill ranges,
min/max active widths) on the REAL canonical tables of the bench workloads.
No timing here — this is the static side of the A/B; run it next to
bench.py / scratch/ablate_decode.py numbers.

Model (1 count = one (8,128)-vreg VPU instruction; a (sub,128) logical op
counts sub/8 physical instructions — we count per LANE ELEMENT = per block,
then divide by the 1024 block-lanes a physical instruction advances):

  - add/sub/and/or/compare/select/shift(variable or immediate): 1
  - constant-operand multiply in the accumulator chain: 1
  - jnp.take_along_axis 7-bit lane gather: G (unknown multi-cycle cost;
    reported for G in {1, 4, 8} — the round-2 deletion ablation measured
    the symbol gather at ~10% of kernel time, which brackets G)
  - VMEM loads of candidate words: counted separately (load slots overlap
    ALU issue on the VPU; they bound a different pipe)
  - vreg iota/constants: loop-invariant, hoisted by Mosaic — not counted

Peak issue assumed: 4 ALU ops x (8,128) lanes per cycle @ 1.74 GHz (TPU
v5e, public scaling-book figures). The printed "ideal GB/s" is THAT bound:
every slot filled, loads/stores free, no dependence stalls — an upper
bound, not a target; the gap to measured is slot-fill efficiency.

Usage: python scratch/roofline.py   (host-only; no TPU needed)
"""

import sys

sys.path.insert(0, ".")

import numpy as np

import bench
from metalhuffman_tpu.models import CodecConfig, frame_stream
from metalhuffman_tpu.ops import decode_pallas as dp

SYMS = dp.SYMS_PER_GROUP
CLOCK = 1.74e9  # TPU v5e
ALUS = 4        # VPU issue slots per cycle (8,128 each)


def specialize(bounds, adj_inc):
    """Mirror _make_kernel's pruning: (base_w, terms, min_w, max_w)."""
    base_w, base_adj, terms = 1, int(adj_inc[0]), []
    for L in range(2, 17):
        b = int(bounds[L - 1])
        if b == 0:
            base_w += 1
            base_adj += int(adj_inc[L - 1])
        elif b < (1 << 16):
            terms.append((b, int(adj_inc[L - 1])))
    return base_w, terms, base_w, base_w + len(terms)


def count_block(wpr, min_w, max_w, n_terms, h2, g_cost, stride=1):
    """Instruction counts per block (= per lane element), by stage.

    ``stride`` models the stride-S refill scan variant (scan wi>>log2(S),
    each candidate selecting S+2 consecutive words + parity selects).
    """
    T = n_terms
    refill = loads = 0
    scan_n = []
    for j in range(16):
        lo = (SYMS * j * min_w) >> 5
        hi = min(wpr - 3, (31 + max_w * SYMS * j) >> 5)
        lo = min(lo, hi)
        refill += 2          # wi, s
        if lo == hi:
            loads += 3
            scan_n.append(0)
        else:
            n = hi - lo + 1
            scan_n.append(n)
            if stride == 1:
                refill += 7 * n          # n compares + 3x(select+add)
                loads += n + 2
            else:
                n_s = (hi // stride) - (lo // stride) + 1
                words = stride + 2       # words selected per candidate
                refill += n_s * (1 + 2 * words)
                # parity selects: (stride-1) levels x 3 outputs + wi&mask
                refill += 3 * (stride - 1) + 2
                loads += n_s * words
        refill += 9          # rs, W0 (4), W1 (4)
    # per symbol: funnel (k=0:1, k=1:6, k>=2:8) + acc chain 3T
    # + w/adj 3 + idx 3 + gather chain 7+G + delta 2 + pack 2 + t 1
    funnel = 1 + 6 + 8 + 8
    per_group_syms = funnel + SYMS * (3 * T + 18 + g_cost)
    symbol = 16 * (per_group_syms + 1)   # +1: bits += t
    # image emission per block row: 4 gathers + 2 selects (+ stores, not ALU)
    emission = 8 * (4 * g_cost + 2)
    return {"refill": refill, "symbol": symbol, "emission": emission,
            "loads": loads, "scan_n": scan_n}


def report(name, frames, stride_list=(1, 2, 4)):
    cfg = CodecConfig(backend="pallas")
    stream = frame_stream.encode_frames_shared(frames, cfg)
    meta, _words, _offsets, wpr = dp.prepare_stream(stream)
    base_w, terms, min_w, max_w = specialize(meta.bounds, meta.adj_inc)
    h2 = dp.image_plan_for(frames.shape[1], frames.shape[2], 8).h2
    print(f"\n== {name}: wpr={wpr} min_w={min_w} max_w={max_w} "
          f"T={len(terms)} compare terms, h2={h2}")
    for g_cost in (1, 4, 8):
        for s in stride_list:
            c = count_block(wpr, min_w, max_w, len(terms), h2, g_cost, s)
            total = c["refill"] + c["symbol"] + c["emission"]
            ideal = ALUS * CLOCK * 1024 / total * 64 / 1e9
            tag = f"G={g_cost} stride={s}"
            print(f"  {tag:16s} refill={c['refill']:5d} "
                  f"symbol={c['symbol']:5d} emission={c['emission']:4d} "
                  f"total={total:5d} ops/block ({total / 64:5.1f}/byte) "
                  f"loads={c['loads']:4d}  ideal(4-issue)={ideal:6.1f} GB/s")
    c = count_block(wpr, min_w, max_w, len(terms), h2, 0, 1)
    print(f"  refill scan widths per group: {c['scan_n']}")
    return wpr


def main():
    T, H, W = 30, 1536, 2048
    report("photo (bridge, panned)", bench.photo_frames(H, W, T))
    report("synthetic (bench headline)", np.stack(
        [bench.synthetic_frame(H, W, seed=0, phase=i) for i in range(T)]))


if __name__ == "__main__":
    main()
