"""Pallas TPU decode kernel: all blocks in parallel, one fused symbol loop.

This replaces the reference's five chained fragment-shader passes
(``AAPLShaders.metal:291-445``, pass chain ``AAPLRenderer.m:1192-1569``) with a
single kernel. The grid tiles the block axis; each program holds
``group_tiles`` interleaved (8,128)-lane tiles of blocks in VMEM and decodes
64 symbols per block in 16 unrolled refill groups of 4. The carry state the
Metal code threads through a texture attachment ({numBitsRead, prevSymbol},
``AAPLShaders.metal:313-326,357-362``) lives in loop-carried vregs.

TPU-specific design (measured on v5e; see SURVEY.md section 7 "hard parts"):

- **No per-lane byte addressing.** Blocks are pre-staged as aligned u32 word
  rows (ops.layout). Each 4-symbol group does ONE one-hot word-select (a
  shared compare drives three statically-shifted row views), building a 64-bit
  funnel window that provably covers all four symbols (4 x 16 bits max).
- **No big-table gathers.** Mosaic supports only single-vreg (8,128) lane
  gathers, so instead of the reference's two-level 8/8-bit LUT
  (``HuffmanUtil.cpp:338-667``) the kernel decodes by *canonical interval
  arithmetic*: left-justified canonical codes partition the 16-bit window
  space into per-length regions with monotone boundaries:

      width(window)  = base + #{active L : window >= B_L}   (pruned compares)
      idx            = adj(width) + (window >> (16 - width))
      symbol         = pair_table[idx >> 1] byte-selected    (one 128-gather)

  Region bounds and adj increments are *baked into the kernel as constants*
  (the kernel is specialized per canonical table — the TPU analog of the
  reference's per-frame pipeline-state build), and compares for code lengths
  absent from the table are pruned at trace time.
- **ILP via tile interleaving.** The decode chain is serial per block; each
  program carries ``group_tiles`` independent chains (sublane-stacked) to
  hide VPU op latency (g=8 is the VMEM-fitting optimum on v5e).
- **Range-limited fetch.** At unrolled group j the word index provably lies
  in [4j*min_width/32, (31+64j)/32], so the word-select scans only that
  static range; early groups collapse to direct loads.
- **Fused width+adj accumulator.** ``acc = w + 256*(adj + 2^16)`` — one
  accumulate per compare term; the low byte is always the code width.
- **Packed output.** 4 decoded bytes per int32 store (little-endian), 4x
  less HBM write traffic; ``unpack_to_blocks`` is the XLA-side bitcast. In
  ``image_h2`` mode the kernel lane-interleaves each block row and stores
  FINAL image positions (h-major feed permutation makes the sublane slices
  contiguous) — the output is the image as int32 words, byte-viewable on the
  host for free, with zero device relayout passes.
- Zero words decode safely (width/index clamp into region 0), so padded lanes
  and padded blocks never index out of bounds.

End-to-end on v5e: ~34 GB/s decoded (30-frame 2048x1536 batch, one
dispatch); evolution and methodology in PERF.md.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import bitstream
from . import layout as layout_mod

LANES = 128
SUBLANES = 8
TILE_BLOCKS = SUBLANES * LANES  # 1024 blocks per tile
DEFAULT_GROUP_TILES = 8  # tiles interleaved per program (ILP)
SYMS_PER_GROUP = 4  # symbols decoded per refill window


@dataclass(frozen=True)
class CanonicalMeta:
    """Canonical-interval decode parameters.

    ``bounds``/``adj_inc`` are hashable tuples baked into the kernel as
    compile-time constants; ``pair_table`` is the 128-lane packed symbol
    table (symbols 2i and 2i+1 of the canonical order in one int32).
    """

    bounds: tuple  # (16,) int: B_L, left-justified start of length-L region
    adj_inc: tuple  # (16,) int: increments of adj(w) = cum_w - first_code_w
    pair_table: np.ndarray  # (8, 128) int32


def canonical_meta(widths: np.ndarray) -> CanonicalMeta:
    """Precompute interval-decode parameters from the 256-byte width table."""
    widths = np.asarray(widths, dtype=np.int64)
    counts = np.bincount(widths[widths > 0], minlength=17)
    first_rj = np.zeros(17, dtype=np.int64)
    code = 0
    for L in range(1, 17):
        first_rj[L] = code
        code = (code + int(counts[L])) << 1
    cum = np.zeros(17, dtype=np.int64)
    np.cumsum(counts[:16], out=cum[1:])

    bounds = np.zeros(16, dtype=np.int64)
    adj16 = np.zeros(16, dtype=np.int64)
    for L in range(1, 17):
        bounds[L - 1] = int(first_rj[L]) << (16 - L)
        adj16[L - 1] = int(cum[L] - first_rj[L])
    inc = np.zeros(16, dtype=np.int64)
    inc[0] = adj16[0]
    inc[1:] = adj16[1:] - adj16[:-1]

    active = np.nonzero(widths)[0]
    order = np.lexsort((active, widths[active]))
    syms = np.zeros(256, dtype=np.int64)
    syms[: active.size] = active[order]
    pair = (syms[0::2] | (syms[1::2] << 8)).astype(np.int32)
    pair_vreg = np.tile(pair[None, :], (SUBLANES, 1))
    return CanonicalMeta(
        bounds=tuple(int(b) for b in bounds),
        adj_inc=tuple(int(v) for v in inc),
        pair_table=pair_vreg,
    )


_SWAR_LOW7 = 0x7F7F7F7F
_SWAR_HI = -2139062144  # 0x80808080 as int32


def _swar_add(a, b):
    """Bytewise mod-256 add of packed 4-byte int32 vregs (no carry bleed).

    Low 7 bits of each byte add directly; each byte's 8th bit is the xor of
    the operands' high bits with the carry out of the low-7 add — the
    standard carry-isolating SWAR sum.
    """
    return (((a & _SWAR_LOW7) + (b & _SWAR_LOW7))
            ^ ((a ^ b) & _SWAR_HI))


def _swar_prefix4(x):
    """Bytewise prefix sums within each packed int32 (byte k += bytes < k)."""
    x = _swar_add(x, jax.lax.shift_left(x, 8))
    return _swar_add(x, jax.lax.shift_left(x, 16))


def _delta2d_row(dy, p0, p1, prev0, prev1):
    """In-register delta2d reconstruction of one 8-pixel block row.

    ``p0``/``p1`` hold the row's raw residuals (pixels 0-3 / 4-7, one byte
    each, little-endian). Row 0 takes a within-row prefix sum (SWAR prefix
    per word + the first word's last byte broadcast into the second word);
    every later row adds the previous reconstructed row bytewise. ~20 SWAR
    adds per 64-symbol block — off the decode chain's critical path and
    zero extra HBM traffic, vs ~3x slowdown for the same reconstruction as
    post-kernel XLA elementwise passes (PERF.md).
    """
    if dy == 0:
        p0 = _swar_prefix4(p0)
        carry = jax.lax.shift_right_logical(p0, 24) * 0x01010101
        p1 = _swar_add(_swar_prefix4(p1), carry)
    else:
        p0 = _swar_add(p0, prev0)
        p1 = _swar_add(p1, prev1)
    return p0, p1


#: test hook: force the refill-scan stride (None = normal choice). Lets
#: interpret-mode tests cover the compiled stride-2 path bit-exactly
#: without paying its interpret op-count tax on every suite test.
_FORCE_STRIDE: int | None = None


def _refill_stride(lo: int, hi: int, interpret: bool) -> int:
    """Static per-group choice of the refill-scan stride (1 or 2).

    The stride-2 scan one-hots ``wi >> 1`` (half the compares), each
    candidate selecting 4 consecutive words with a parity select picking
    the 3-word window. Modeled VPU op cost (matching scratch/roofline.py):
    stride 1 = 7n; stride 2 = 9·n_2 + 5. Measured +2.8-2.9% end to end in
    BOTH interleaved A/B runs on the photo workload (parity on synthetic);
    stride 4/8 and an O(S)-op slab/reshape form were inside the harness's
    ~1% noise (PERF.md "The decode roofline, closed", round 4).

    The win needs the per-candidate UNROLLED form (scalar-indexed ref
    loads + select/add chains), whose traced op count scales with the
    scan range — that made interpret-mode tests ~3x slower, so interpret
    keeps stride 1 (bit-identical result either way; a dedicated test
    forces stride 2 through interpret via ``_FORCE_STRIDE``).
    """
    if _FORCE_STRIDE is not None:
        return _FORCE_STRIDE
    if interpret:
        return 1
    n = hi - lo + 1
    n_2 = (hi >> 1) - (lo >> 1) + 1
    return 2 if 9 * n_2 + 5 < 7 * n else 1


def _make_kernel(width: int, bounds, adj_inc, *, sub: int, num_steps: int,
                 delta: bool, image_h2: int = 0, emit_end: bool = False,
                 delta2d: bool = False, interpret: bool = False):
    """Build the kernel body specialized for one canonical table.

    ``image_h2 > 0`` selects image-strip emission (see decode_tiles_images):
    after every two 4-symbol groups (= one 8-pixel block row), the two packed
    vregs are lane-interleaved into half-row word order and stored at the
    row's final image position — the kernel output IS the image, up to a
    host-side byte view. Requires num_steps == 64 (8x8 blocks).

    ``emit_end`` adds a second output holding each block's final row-local
    bit position (the loop carry — free to surface). A well-formed block
    ends exactly at ``init + block_bits``; comparing against the offset
    index detects stream corruption/desync on-device, the TPU analog of
    the reference's decode-verify assert (``AAPLRenderer.m:1849-1876``).

    ``delta2d`` reconstructs the 2-D within-block predictor (mode 3) in
    registers on the emission side (:func:`_delta2d_row`); requires
    num_steps == 64 and delta=False (the in-chain accumulate is the 1-D
    predictor's).
    """
    if delta2d and (delta or num_steps != 64):
        raise ValueError("delta2d kernel mode needs delta=False and 8x8 blocks")
    # Prune compares: bound 0 => always true (fold into base); bound >= 2^16
    # => length unused above the max active width (always false).
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
    n_groups = num_steps // SYMS_PER_GROUP

    min_w = base_w  # smallest active code width (bounds folded into base)
    # largest active width = base + all compares satisfied; tables narrower
    # than 16 bits (e.g. photos: 2..14) tighten the refill fetch range below
    max_w = base_w + len(terms)

    def kernel(rows_ref, init_ref, pair_ref, out_ref, *maybe_end_ref):
        pair_tab = pair_ref[:]
        if image_h2:
            lane = jax.lax.broadcasted_iota(jnp.int32, (sub, LANES), 1)
            half_idx = lane >> 1
            parity = (lane & 1) == 1

        def outer(j, carry):
            bits, prev = carry
            wi = jax.lax.shift_right_logical(bits, 5)
            s = bits & 31
            # one shared one-hot selects the 3-word refill for this group.
            # At unrolled group j the word index provably lies in
            # [4j*min_w/32, (31 + 4j*max_w)/32] (init < 32, each symbol
            # consumes min_w..max_w bits), so the select only scans that
            # static range (ref loads per group: Mosaic lowers these
            # natively, unlike variable-length value slices).
            lo = (SYMS_PER_GROUP * j * min_w) >> 5
            hi = min(width - 3, (31 + max_w * SYMS_PER_GROUP * j) >> 5)
            lo = min(lo, hi)
            stride = _refill_stride(lo, hi, interpret)
            if lo == hi:
                # word index is fully determined (early groups) — no select
                w0 = rows_ref[0, lo]
                w1 = rows_ref[0, lo + 1]
                w2 = rows_ref[0, lo + 2]
            elif stride > 1:
                # stride-S scan (round-4 roofline study, +2.8% measured
                # on photo content): one-hot on wi>>log2(S) — 1/S the
                # compares — with each candidate selecting S+2
                # consecutive words; an (S-1)-level parity select then
                # picks the 3-word window. Deliberately UNROLLED
                # (scalar-indexed ref loads + select/add chains): an
                # O(S)-op slab/reshape form lowers too but loses the
                # measured win to shape-cast overhead (PERF.md round 4).
                # A candidate word index past width-1 is clamped: it is
                # only ever SELECTED when wi needs word wi+2 <= width-1,
                # so the clamped garbage never reaches a legal window.
                shift = stride.bit_length() - 1
                lo_s, hi_s = lo >> shift, hi >> shift
                wi_s = jax.lax.shift_right_logical(wi, shift)
                iota_s = lo_s + jax.lax.broadcasted_iota(
                    jnp.int32, (hi_s - lo_s + 1, sub, LANES), 0)
                oh = iota_s == wi_s[None]
                cand = []
                for d in range(stride + 2):
                    acc = jnp.where(
                        oh[0], rows_ref[0, min(stride * lo_s + d, width - 1)],
                        0)
                    for c in range(1, hi_s - lo_s + 1):
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
            # 64-bit window left-justified at `bits` (W0 high, W1 low);
            # >>1 >>(31-s) instead of >>(32-s) avoids the undefined >>32.
            W0 = jax.lax.shift_left(w0, s) | jax.lax.shift_right_logical(
                jax.lax.shift_right_logical(w1, 1), rs)
            W1 = jax.lax.shift_left(w1, s) | jax.lax.shift_right_logical(
                jax.lax.shift_right_logical(w2, 1), rs)

            t = jnp.zeros_like(s)
            packed = jnp.zeros_like(s)
            for k in range(SYMS_PER_GROUP):
                # local extraction: 4 symbols consume <= 64 bits, and a
                # symbol starting at t <= 48 never reads past bit 64, so
                # (W0, W1) always suffice (W1 garbage low bits can only
                # reach the window when t > 48 — impossible). Static facts:
                # k=0 -> t == 0 (no funnel); k=1 -> t <= 16 (hi is W0).
                if k == 0:
                    win32 = W0
                else:
                    w_hi = W0 if k == 1 else jnp.where(t < 32, W0, W1)
                    u = t & 31
                    win32 = jax.lax.shift_left(w_hi, u) | \
                        jax.lax.shift_right_logical(
                            jax.lax.shift_right_logical(W1, 1), 31 - u)
                window = jax.lax.shift_right_logical(win32, 16)
                # fused accumulator: acc = w + 256*(adj + 2^16); adj may be
                # negative but |adj| < 2^16, so the low byte is always w
                acc = jnp.full_like(
                    window, base_w + ((base_adj + (1 << 16)) << 8))
                for b, ai in terms:
                    m = (window >= b).astype(jnp.int32)
                    acc = acc + m * (1 + (ai << 8))
                w = acc & 0xFF
                adj = jax.lax.shift_right_logical(acc, 8) - (1 << 16)
                idx = adj + jax.lax.shift_right_logical(window, 16 - w)
                pairv = jnp.take_along_axis(
                    pair_tab, jax.lax.shift_right_logical(idx, 1) & 127, axis=1)
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
        prev0 = prev1 = jnp.zeros((sub, LANES), jnp.int32)
        if not image_h2:
            if delta2d:
                for dy in range(n_groups // 2):  # one 8-pixel block row
                    carry, p0 = outer(2 * dy, carry)
                    carry, p1 = outer(2 * dy + 1, carry)
                    prev0, prev1 = _delta2d_row(dy, p0, p1, prev0, prev1)
                    out_ref[0, 2 * dy] = prev0
                    out_ref[0, 2 * dy + 1] = prev1
            else:
                for j in range(n_groups):  # unrolled: static store indices
                    carry, packed = outer(j, carry)
                    out_ref[0, j] = packed
            if emit_end:
                maybe_end_ref[0][0] = carry[0]
        else:
            rows_pp = sub // image_h2
            for dy in range(8):
                carry, p0 = outer(2 * dy, carry)      # pixels 0..3 of row dy
                carry, p1 = outer(2 * dy + 1, carry)  # pixels 4..7
                if delta2d:
                    p0, p1 = prev0, prev1 = _delta2d_row(
                        dy, p0, p1, prev0, prev1)
                # lane interleave: half-row word k <- block k>>1, word k&1
                lo = jnp.where(
                    parity,
                    jnp.take_along_axis(p1, half_idx, axis=1),
                    jnp.take_along_axis(p0, half_idx, axis=1))
                hi2 = jnp.where(
                    parity,
                    jnp.take_along_axis(p1, 64 + half_idx, axis=1),
                    jnp.take_along_axis(p0, 64 + half_idx, axis=1))
                # h-major sublane feed => contiguous static slices per half
                for h in range(image_h2):
                    sl = slice(h * rows_pp, (h + 1) * rows_pp)
                    out_ref[0, :, dy, (2 * h) * LANES:(2 * h + 1) * LANES] = lo[sl]
                    out_ref[0, :, dy,
                            (2 * h + 1) * LANES:(2 * h + 2) * LANES] = hi2[sl]
            if emit_end:
                maybe_end_ref[0][0] = carry[0]

    return kernel


@partial(jax.jit, static_argnames=(
    "width", "bounds", "adj_inc", "num_steps", "delta", "group_tiles",
    "interpret", "emit_end_bits", "delta2d"))
def decode_tiles(rows_tiled, init_tiled, pair_table, *, width: int, bounds,
                 adj_inc, num_steps: int = 64, delta: bool = True,
                 group_tiles: int = DEFAULT_GROUP_TILES,
                 interpret: bool = False, emit_end_bits: bool = False,
                 delta2d: bool = False):
    """Run the decode kernel over pre-tiled inputs.

    Args:
        rows_tiled: (nt, W, 8, 128) int32 big-endian word rows per block;
            nt must be a multiple of ``group_tiles`` (tile_layout_jax pads).
        init_tiled: (nt, 8, 128) int32 starting bit offset within each row.
        pair_table: (8, 128) int32 packed canonical symbol pairs.
        bounds/adj_inc: CanonicalMeta tuples (static — kernel specializers).
        emit_end_bits: also return each block's final row-local bit position
            (``(ng, g*8, 128) int32``, same block order as the output) for
            on-device stream-integrity checking (:func:`check_block_ends`).

    Returns:
        (nt//g, num_steps//4, g*8, 128) int32: 4 decoded bytes packed
        little-endian per element, blocks in stream order along the
        (axis0, axis2, axis3) dims (see :func:`unpack_to_blocks`).
        With ``emit_end_bits``: a (packed, end_bits) tuple.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if num_steps % SYMS_PER_GROUP:
        raise ValueError(
            f"num_steps ({num_steps}) must be a multiple of {SYMS_PER_GROUP} "
            "for the Pallas kernel (use block_dim 2/4/8/16 or the xla backend)"
        )
    nt = rows_tiled.shape[0]
    g = group_tiles
    while nt % g:
        g //= 2
    ng = nt // g
    sub = g * SUBLANES
    n_groups = num_steps // SYMS_PER_GROUP

    rows_g = rows_tiled.reshape(ng, g, width, SUBLANES, LANES).transpose(
        0, 2, 1, 3, 4).reshape(ng, width, sub, LANES)
    init_g = init_tiled.reshape(ng, sub, LANES)
    pair_g = jnp.tile(pair_table, (g, 1))

    kernel = _make_kernel(
        width, bounds, adj_inc, sub=sub, num_steps=num_steps, delta=delta,
        emit_end=emit_end_bits, delta2d=delta2d, interpret=interpret)
    out_specs = pl.BlockSpec((1, n_groups, sub, LANES),
                             lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((ng, n_groups, sub, LANES), jnp.int32)
    if emit_end_bits:
        out_specs = (out_specs,
                     pl.BlockSpec((1, sub, LANES), lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((ng, sub, LANES), jnp.int32))
    out = pl.pallas_call(
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
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(rows_g, init_g, pair_g)
    # stays in grouped layout; block order is (ng, g*8, 128) = stream order,
    # which unpack_to_blocks consumes directly (no extra transpose pass)
    return out


@partial(jax.jit, static_argnames=(
    "width", "bounds", "adj_inc", "h2", "delta", "group_tiles", "interpret",
    "emit_end_bits", "delta2d"))
def decode_tiles_images(rows_tiled, init_tiled, pair_table, *, width: int,
                        bounds, adj_inc, h2: int, delta: bool = True,
                        group_tiles: int = DEFAULT_GROUP_TILES,
                        interpret: bool = False, emit_end_bits: bool = False,
                        delta2d: bool = False):
    """Decode straight into image layout (8x8 blocks, W = h2*1024 pixels).

    Requires inputs staged by :func:`tile_layout_images` (h-major feed
    permutation). Returns (ng, sub//h2, 8, h2*256) int32: flattened over
    (axis0, axis1, axis2) it is the image row sequence, each row as W//4
    little-endian 4-pixel words. A host ``.view(uint8)`` (or
    :func:`images_from_strips` + bitcast) yields pixels — no device
    transpose or relayout pass at all.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nt = rows_tiled.shape[0]
    g = group_tiles
    while nt % g:
        g //= 2
    ng = nt // g
    sub = g * SUBLANES
    if sub % h2:
        raise ValueError(f"h2={h2} must divide sub={sub}")
    rows_pp = sub // h2

    rows_g = rows_tiled.reshape(ng, g, width, SUBLANES, LANES).transpose(
        0, 2, 1, 3, 4).reshape(ng, width, sub, LANES)
    init_g = init_tiled.reshape(ng, sub, LANES)
    pair_g = jnp.tile(pair_table, (g, 1))

    kernel = _make_kernel(
        width, bounds, adj_inc, sub=sub, num_steps=64, delta=delta,
        image_h2=h2, emit_end=emit_end_bits, delta2d=delta2d,
        interpret=interpret)
    out_specs = pl.BlockSpec((1, rows_pp, 8, h2 * 2 * LANES),
                             lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((ng, rows_pp, 8, h2 * 2 * LANES),
                                     jnp.int32)
    if emit_end_bits:
        out_specs = (out_specs,
                     pl.BlockSpec((1, sub, LANES), lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((ng, sub, LANES), jnp.int32))
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
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(rows_g, init_g, pair_g)


def image_h2_for(width_px: int, block_dim: int = 8) -> int:
    """Half-row arity for the *exact-fit* image-layout kernel; 0 otherwise.

    Kept for callers that cannot crop; :func:`image_plan_for` generalizes to
    arbitrary widths via column padding.
    """
    if block_dim != 8 or width_px % 1024:
        return 0
    return width_px // 1024


@dataclass(frozen=True)
class ImagePlan:
    """Geometry plan for image-layout decode of an arbitrary-size image.

    Each image block-row is padded from ``bw`` to ``bw_pad = h2 * 128``
    blocks (the lane-interleave emission needs whole 128-lane groups per
    row segment); the dummy blocks decode garbage into columns past the
    real image, cropped by the consumer (a host view for raw strips, a
    device slice otherwise). This generalizes the reference's crop/zip
    shader's arbitrary-geometry handling (``AAPLShaders.metal:449-518``)
    to the TPU layout: 1920x1080 pays 6.7% pad work instead of falling
    off the fast path entirely.
    """

    h2: int          # 128-lane groups per image block-row
    group_tiles: int  # kernel ILP grouping g; h2 must divide g * 8
    bw: int          # real blocks per image row
    bw_pad: int      # padded blocks per image row (= h2 * 128)
    bh: int          # block rows per frame
    w_pad: int       # padded row width in pixels (= bw_pad * 8)


def image_plan_for(height_px: int, width_px: int, block_dim: int = 8,
                   max_group: int = DEFAULT_GROUP_TILES,
                   max_pad_ratio: float = 2.0) -> ImagePlan | None:
    """Pick the image-layout geometry for (H, W), or None for the generic path.

    None when: block_dim != 8; no ILP grouping g <= max_group satisfies
    ``h2 | 8g`` (the emission slices sublanes in ``sub // h2`` chunks); or
    the pad waste exceeds ``max_pad_ratio`` (the generic packed-blocks path
    is then the better trade).
    """
    if block_dim != 8:
        return None
    bw = -(-width_px // 8)
    bh = -(-height_px // 8)
    h2 = -(-bw // LANES)
    g = next((gg for gg in range(max_group, 0, -1)
              if (SUBLANES * gg) % h2 == 0), None)
    if g is None:
        return None
    bw_pad = h2 * LANES
    if bw_pad > max_pad_ratio * bw:
        return None
    return ImagePlan(h2=h2, group_tiles=g, bw=bw, bw_pad=bw_pad, bh=bh,
                     w_pad=bw_pad * 8)


def pad_offsets_grid(block_offsets, n_rows: int, bw: int, bw_pad: int):
    """Row-major (n_rows * bw,) offsets -> (n_rows * bw_pad,) with dummy
    zero offsets in the padded columns (they decode garbage safely)."""
    if bw_pad == bw:
        return block_offsets.astype(jnp.int32)
    offs = block_offsets.astype(jnp.int32).reshape(n_rows, bw)
    return jnp.pad(offs, ((0, 0), (0, bw_pad - bw))).reshape(-1)


def feed_permute_images(x_flat, h2: int, group_tiles: int, fill: int = 0):
    """Apply the h-major feed permutation to a flat per-block int array.

    Pads to whole programs with ``fill`` and returns (nt, 8, 128) in the
    exact lane order :func:`tile_layout_images` stages blocks (and hence
    the order the kernel's per-block outputs, e.g. end bits, come back in).
    """
    nb = x_flat.shape[0]
    sub = group_tiles * SUBLANES
    per_prog = sub * LANES
    ngp = -(-nb // per_prog)
    rows_pp = sub // h2
    xp = jnp.pad(x_flat.astype(jnp.int32), (0, ngp * per_prog - nb),
                 constant_values=fill)
    return xp.reshape(ngp, rows_pp, h2, LANES).transpose(0, 2, 1, 3).reshape(
        ngp * group_tiles, SUBLANES, LANES)


def unpermute_images_flat(x, h2: int, group_tiles: int):
    """Inverse of :func:`feed_permute_images` -> flat padded-grid order.

    Accepts any array whose flat order matches the staged lane order
    ((nt, 8, 128) and the kernel's (ng, g*8, 128) end-bits output flatten
    identically).
    """
    flat = np.asarray(x).reshape(-1)
    per_prog = group_tiles * SUBLANES * LANES
    ngp = flat.size // per_prog
    rows_pp = group_tiles * SUBLANES // h2
    return flat.reshape(ngp, h2, rows_pp, LANES).transpose(
        0, 2, 1, 3).reshape(-1)


def tile_layout_images(code_words_be, block_offsets, width: int, h2: int,
                       group_tiles: int = DEFAULT_GROUP_TILES):
    """Stage tiles with the h-major feed permutation for image-layout decode.

    Blocks are fed so each program's sublanes enumerate (half, image-row)
    h-major — then the kernel's contiguous sublane slices land at final
    image positions. Offsets are padded to whole programs; padded blocks
    decode garbage into rows past the real image (cropped by the caller).
    """
    nb = block_offsets.shape[0]
    offs = feed_permute_images(block_offsets, h2, group_tiles)
    word_start = offs >> 5
    idx = word_start[:, None] + jnp.arange(width, dtype=jnp.int32).reshape(
        1, width, 1, 1)
    rows = jnp.take(code_words_be.astype(jnp.int32), idx, mode="clip")
    return rows, offs & 31, nb


def images_from_strips(strips, num_frames: int, height: int, width: int):
    """(ng, rows_pp, 8, W//4) strips -> (T, H, W//4) int32 image words.

    Pure reshape + crop (no data movement beyond the slice); bitcast to
    bytes on the host via ``np.asarray(x).view(np.uint8)`` for free.
    """
    return strips.reshape(-1, width // 4)[: num_frames * height].reshape(
        num_frames, height, width // 4)


def images_from_strips_padded(strips, num_frames: int, height: int,
                              width: int, w_pad: int, bh: int):
    """Column/row-padded strips -> (T, H, W) uint8 images (device crop).

    The ImagePlan pad columns (and any block-row padding past H) are sliced
    off after a byte bitcast; one XLA slice, no gather.
    """
    rows_pf = bh * 8
    flat = strips.reshape(-1, w_pad // 4)[: num_frames * rows_pf]
    img8 = jax.lax.bitcast_convert_type(
        flat.reshape(num_frames, rows_pf, w_pad // 4), jnp.uint8
    ).reshape(num_frames, rows_pf, w_pad)
    return img8[:, :height, :width]


def unpack_to_blocks(out_packed, n_blocks: int, num_steps: int = 64):
    """(nt, num_steps//4, 8, 128) packed int32 -> (n_blocks, num_steps) uint8."""
    b = jax.lax.bitcast_convert_type(out_packed, jnp.uint8)  # (...,4) LE bytes
    b = jnp.moveaxis(b, 1, -2)  # (nt, 8, 128, groups, 4)
    return b.reshape(-1, num_steps)[:n_blocks]


def unpack_to_images(out_packed, num_frames: int, height: int, width: int,
                     block_dim: int = 8):
    """Packed kernel output -> (T, H, W) uint8 images, transposing in int32.

    Byte-granular transposes are slow on TPU; this path reorders the packed
    4-byte words (aligned int32 moves) and only bitcasts to bytes at the very
    end, which is ~4x faster than unpack_to_blocks + per-frame reassembly.
    Requires block_dim % 4 == 0 and an exact tile fit
    (T * bh * bw == total blocks including padding) — callers fall back to
    :func:`unpack_to_blocks` otherwise.
    """
    if block_dim % 4:
        raise ValueError("int32 unpack requires block_dim % 4 == 0")
    gpr = block_dim // 4  # int32 groups per block row
    bh, bw = height // block_dim, width // block_dim
    n_groups = out_packed.shape[1]
    # (ng, G, sub, 128) -> blocks-major packed (T*bh*bw, G)
    blk32 = jnp.moveaxis(out_packed, 1, -1).reshape(-1, n_groups)
    blk32 = blk32[: num_frames * bh * bw]
    # (T, bh, bw, block_dim, gpr) -> (T, bh, block_dim, bw, gpr)
    strip = blk32.reshape(num_frames, bh, bw, block_dim, gpr).transpose(
        0, 1, 3, 2, 4)
    img32 = strip.reshape(num_frames, height, width // 4)
    return jax.lax.bitcast_convert_type(img32, jnp.uint8).reshape(
        num_frames, height, width)


def tile_layout_jax(code_words_be, block_offsets, width: int,
                    group_tiles: int = DEFAULT_GROUP_TILES):
    """Device-side layout gather producing kernel-ready tiles.

    Returns (rows_tiled (nt,W,8,128) int32, init_tiled (nt,8,128) int32,
    n_blocks). nt is padded to a multiple of ``group_tiles``; blocks beyond
    n_blocks are zero-padded (they decode garbage safely).
    """
    nb = block_offsets.shape[0]
    tile_mult = TILE_BLOCKS * group_tiles
    nt = (-(-nb // tile_mult)) * group_tiles
    offs = jnp.pad(block_offsets.astype(jnp.int32), (0, nt * TILE_BLOCKS - nb))
    offs = offs.reshape(nt, SUBLANES, LANES)
    word_start = offs >> 5
    idx = word_start[:, None] + jnp.arange(width, dtype=jnp.int32).reshape(
        1, width, 1, 1
    )
    rows = jnp.take(code_words_be.astype(jnp.int32), idx, mode="clip")
    return rows, offs & 31, nb


def prepare_stream(stream, block_size: int = 64):
    """Host-side staging: (meta, words, offsets, width) for decode."""
    meta = canonical_meta(stream.widths)
    total_bits = 8 * (stream.code_bytes.size - bitstream.READ_AHEAD_PAD_BYTES)
    width = layout_mod.words_per_block(
        layout_mod.max_block_bits(stream.block_offsets, total_bits),
        symbols_per_block=block_size,
    )
    words = bitstream.bytes_to_be_words(stream.code_bytes, pad_words=width)
    return meta, words, stream.block_offsets.astype(np.int32), width


def decode_stream_pallas(stream, *, delta: bool = True, block_size: int = 64,
                         interpret: bool = False):
    """Full decode of an EncodedStream via the Pallas kernel -> (nblocks, 64)."""
    meta, words, offsets, width = prepare_stream(stream, block_size)
    rows, init, nb = tile_layout_jax(
        jnp.asarray(words), jnp.asarray(offsets), width)
    out = decode_tiles(
        rows, init, jnp.asarray(meta.pair_table),
        width=width, bounds=meta.bounds, adj_inc=meta.adj_inc,
        num_steps=block_size, delta=delta, interpret=interpret,
    )
    return unpack_to_blocks(out, nb, block_size)


# -- on-device stream-integrity check -----------------------------------------
#
# A canonical Huffman stream self-synchronizes only if every bit is intact:
# any flipped/lost bit desyncs the decoder, and the block then ends at the
# wrong bit position with overwhelming probability. The kernel's loop carry
# already holds each block's final row-local bit position — emitting it
# (``emit_end_bits``) and comparing against ``init + block_bits`` (known from
# the offset index) yields a per-block corruption mask with no extra decode
# work. This is the device analog of the reference's decode-verify assert
# (``AAPLRenderer.m:1849-1876``), but O(blocks) instead of O(pixels), and it
# runs on the production path rather than a separate verification decode.
# (A corruption that preserves total bit length within a block — e.g. two
# compensating symbol swaps — passes this check; pair it with the container
# CRC for whole-payload integrity.)

def block_end_targets(block_offsets, last_end_bit: int | None) -> np.ndarray:
    """Stream-order expected row-local end bit per block -> (nb,) int32.

    ``last_end_bit`` is the bit position where the LAST block ends (equal to
    the stream's exact total bits when there is no partial tail). Pass None
    when unknown (e.g. the stream may carry tail symbols past the last
    whole block): the last block is then marked -1 = unchecked.
    """
    offs = np.asarray(block_offsets, dtype=np.int64)
    if offs.size == 0:
        return np.zeros(0, np.int32)
    if last_end_bit is None:
        ends = np.append(offs[1:], offs[-1])  # placeholder, masked below
    else:
        ends = np.append(offs[1:], np.int64(last_end_bit))
    t = ((offs & 31) + (ends - offs)).astype(np.int32)
    if last_end_bit is None:
        t[-1] = -1
    return t


def check_block_ends(end_bits, targets) -> np.ndarray:
    """Kernel end-bits vs targets (-1 = don't check) -> flat bool err mask.

    ``end_bits`` is the kernel's second output; ``targets`` must be staged
    in the SAME lane order (plain stream order reshaped for the tile path,
    :func:`feed_permute_images` with fill=-1 for the image path).
    """
    e = np.asarray(end_bits).reshape(-1)
    t = np.asarray(targets).reshape(-1)
    return (e != t) & (t >= 0)


def decode_stream_checked(stream, *, delta: bool = True, block_size: int = 64,
                          interpret: bool = False):
    """Decode + integrity-check an EncodedStream on-device.

    Returns (blocks (nb, block_size) uint8, err_mask (nb,) bool). A True
    mask entry means that block did not end at its indexed bit position —
    the stream is corrupt or truncated there.
    """
    meta, words, offsets, width = prepare_stream(stream, block_size)
    rows, init, nb = tile_layout_jax(
        jnp.asarray(words), jnp.asarray(offsets), width)
    out, end = decode_tiles(
        rows, init, jnp.asarray(meta.pair_table),
        width=width, bounds=meta.bounds, adj_inc=meta.adj_inc,
        num_steps=block_size, delta=delta, interpret=interpret,
        emit_end_bits=True,
    )
    targets = block_end_targets(offsets, None)
    tgt = np.full(end.size, -1, np.int32)
    tgt[:nb] = targets
    err = check_block_ends(end, tgt)[:nb]
    if stream.num_symbols == nb * block_size:
        # no tail symbols: the last block ends at the stream's exact bit
        # count, known only up to byte rounding -> loose window check
        total_bits = 8 * (
            stream.code_bytes.size - bitstream.READ_AHEAD_PAD_BYTES)
        last_end = int(np.asarray(end).reshape(-1)[nb - 1])
        hi = (int(offsets[-1]) & 31) + (total_bits - int(offsets[-1]))
        err[nb - 1] = not (hi - 7 <= last_end <= hi)
    return unpack_to_blocks(out, nb, block_size), err
