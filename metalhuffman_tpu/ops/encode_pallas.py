"""Pallas TPU encode kernel: hybrid device/host canonical-Huffman encoder.

The inverse of the decode kernel (``decode_pallas.py``), replacing the
reference's single-threaded host append loop (``HuffmanEncoder.cpp:211-276``)
with a two-stage pipeline:

- **Stage 1 (Pallas, device)**: every block packs its 64 symbols into a
  padded ``wmax``-word row in parallel — one (8,128) lane tile is 1024
  independent blocks. Each 4-symbol group builds a 64-bit chunk in vregs
  (two one-hot table gathers per symbol, the same single-vreg 128-lane
  gather the decode kernel uses for its pair table) and ORs it into the
  row's local words with a one-hot deposit — no dynamic addressing, the
  dual of the decode kernel's one-hot word-select. Measured 25.6 GB/s on
  v5e (PERF.md "Device encode investigation").
- **Stage 2 (C++, host)**: ``native.merge_rows`` — a multithreaded
  bit-shift memcpy that concatenates the padded rows into the contiguous
  MSB-first stream, using the same head-byte OR seam trick as the
  multithreaded host encoder (``native/src/mht_codec.cpp::mht_encode_mt``).
  Per-block offsets fall out of a prefix sum over per-block bit counts.

Why the split: per-lane dynamic addressing does not exist on TPU, so row
*compaction* cannot run in-kernel, and every XLA formulation bottoms out in
large random gathers/scatters (878 ms best for 94 MB — PERF.md table). The
host merge moves 32 bits per ~5 ALU ops instead, at memory speed.

The output stream is byte-identical to ``native.encode_symbols`` /
``core.encode.encode_symbols`` (differential tests in
tests/test_encode_pallas.py): same canonical table (built on host by the
same native/NumPy code), same MSB-first packing, same +2 read-ahead pad
(``HuffmanEncoder.cpp:371-378``), same per-block offsets
(``HuffmanUtil.cpp:1102-1117``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import native
from ..core import bitstream
from ..core.container import EncodedStream

SUBLANES, LANES = 8, 128
BLOCKS_PER_TILE = SUBLANES * LANES
BLOCK_SYMBOLS = 64  # kernel is specialized to 8x8 blocks (16 groups of 4)


def make_encode_kernel(wmax: int, min_w: int = 1, max_w: int = 16):
    """Stage-1 kernel: (1, 64, 8, 128) symbols -> (1, wmax+1, 8, 128) rows.

    Output words 0..wmax-1 are the block's MSB-first packed bits (zero
    padded); word wmax is the block's total bit count (redundant with the
    host-side width sum — kept as a cheap cross-check output).

    ``min_w``/``max_w`` are the canonical table's min/max USED symbol
    widths: group g's in-block bit offset t is statically bounded by
    ``[4g*min_w, 4g*max_w]``, so the one-hot deposit scans only words
    ``[t_lo>>5, (t_hi>>5)+2]`` instead of all wmax — the dual of the
    decode kernel's static per-group refill ranges. The round-5 encode
    roofline (scratch/roofline_encode.py) identified the full-scan
    deposit as 37-70%% of kernel ops; ranging it removes ~16-29%% of the
    total. Padding blocks past n_blocks may carry symbols outside the
    used-width band (their widths can even be 0) and deposit outside the
    ranged window — their rows are garbage by contract and masked out of
    the merge, so correctness only needs real symbols' widths inside
    [min_w, max_w].
    """

    def kernel(sym_ref, codes_ref, widths_ref, out_ref):
        codes_tab = codes_ref[:]    # (8,128): codes s=2i | s=2i+1 << 16
        widths_tab = widths_ref[:]  # (8,128): widths s=2i | s=2i+1 << 8

        words = [jnp.zeros((SUBLANES, LANES), jnp.int32) for _ in range(wmax)]
        t = jnp.zeros((SUBLANES, LANES), jnp.int32)  # in-block bit offset
        for g in range(BLOCK_SYMBOLS // 4):
            # build one 64-bit chunk (C0 hi word, C1 lo word) from 4 symbols
            C0 = jnp.zeros((SUBLANES, LANES), jnp.int32)
            C1 = jnp.zeros((SUBLANES, LANES), jnp.int32)
            L = jnp.zeros((SUBLANES, LANES), jnp.int32)  # bits in chunk
            for k in range(4):
                s = sym_ref[0, 4 * g + k]
                half = jax.lax.shift_right_logical(s, 1) & 127
                cp = jnp.take_along_axis(codes_tab, half, axis=1)
                wp = jnp.take_along_axis(widths_tab, half, axis=1)
                odd = (s & 1) == 1
                code = jnp.where(
                    odd, jax.lax.shift_right_logical(cp, 16), cp) & 0xFFFF
                w = jnp.where(
                    odd, jax.lax.shift_right_logical(wp, 8), wp) & 0xFF
                # append the left-justified code at chunk bit offset L.
                # L + w <= 64 always (4 x 16-bit max), so nothing spills.
                c32 = jax.lax.shift_left(code, 16)  # left-justified in 32
                sh = L & 31
                hi_part = jax.lax.shift_right_logical(c32, sh)
                lo_part = jax.lax.shift_left(c32, 1)
                lo_part = jax.lax.shift_left(lo_part, 31 - sh)  # c32<<(32-sh)
                in_hi = L < 32
                C0 = C0 | jnp.where(in_hi, hi_part, 0)
                C1 = C1 | jnp.where(in_hi, lo_part, hi_part)
                L = L + w
            # deposit the chunk at in-block bit offset t: it spans at most
            # three of the row's words (t&31 misalignment + 64 bits)
            wi = jax.lax.shift_right_logical(t, 5)
            sh = t & 31
            d0 = jax.lax.shift_right_logical(C0, sh)
            mid = jax.lax.shift_left(C0, 1)
            mid = (jax.lax.shift_left(mid, 31 - sh)
                   | jax.lax.shift_right_logical(C1, sh))
            d2 = jax.lax.shift_left(C1, 1)
            d2 = jax.lax.shift_left(d2, 31 - sh)
            lo = (4 * g * min_w) >> 5
            hi = min(wmax - 1, ((4 * g * max_w) >> 5) + 2)
            for j in range(lo, hi + 1):
                words[j] = (words[j]
                            | jnp.where(wi == j, d0, 0)
                            | jnp.where(wi == j - 1, mid, 0)
                            | jnp.where(wi == j - 2, d2, 0))
            t = t + L
        for j in range(wmax):
            out_ref[0, j] = words[j]
        out_ref[0, wmax] = t

    return kernel


@partial(jax.jit, static_argnames=("wmax", "min_w", "max_w", "interpret"))
def encode_rows(sym_tiled, codes_pair, widths_pair, *, wmax: int,
                min_w: int = 1, max_w: int = 16,
                interpret: bool = False):
    """(nt, 64, 8, 128) int32 symbols -> (nt, wmax+1, 8, 128) int32 rows."""
    nt = sym_tiled.shape[0]
    return pl.pallas_call(
        make_encode_kernel(wmax, min_w, max_w),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, BLOCK_SYMBOLS, SUBLANES, LANES),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, wmax + 1, SUBLANES, LANES),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nt, wmax + 1, SUBLANES, LANES),
                                       jnp.int32),
        interpret=interpret,
    )(sym_tiled, codes_pair, widths_pair)


def used_width_band(widths: np.ndarray) -> tuple[int, int]:
    """(min, max) USED symbol width of a canonical table (width 0 =
    unused symbol). Static bounds for the kernel's ranged deposit."""
    used = np.asarray(widths)[np.asarray(widths) > 0]
    if used.size == 0:
        return 1, 16
    return int(used.min()), int(used.max())


def pack_code_tables(widths: np.ndarray, codes: np.ndarray):
    """(256,) widths/codes -> two (8,128) int32 pair tables (sublane-tiled).

    Same pair-packing scheme as the decode kernel's symbol table: entry i
    holds symbols 2i (low half) and 2i+1 (high half), so a 128-lane gather
    plus a parity select covers all 256 symbols.
    """
    codes_pair = (codes[0::2].astype(np.int64)
                  | (codes[1::2].astype(np.int64) << 16)).astype(np.int32)
    widths_pair = (widths[0::2].astype(np.int64)
                   | (widths[1::2].astype(np.int64) << 8)).astype(np.int32)
    return (np.tile(codes_pair[None], (SUBLANES, 1)),
            np.tile(widths_pair[None], (SUBLANES, 1)))


@partial(jax.jit, static_argnames=("nt",))
def _stage_symbols(data_dev, *, nt: int):
    """(nt*1024*64,) uint8 on device -> (nt, 64, 8, 128) int32 for the kernel.

    Block b = tile*1024 + sublane*128 + lane; symbol axis moves to dim 1 so
    ``sym_ref[0, i]`` is one (8,128) vreg of symbol i across 1024 blocks.
    """
    return (data_dev.reshape(nt, SUBLANES, LANES, BLOCK_SYMBOLS)
            .transpose(0, 3, 1, 2).astype(jnp.int32))


@partial(jax.jit, static_argnames=("wmax", "n_blocks"))
def _rows_block_major(out, *, wmax: int, n_blocks: int):
    """Kernel output -> (n_blocks, wmax) block-major rows for the host merge."""
    nt = out.shape[0]
    return (out[:, :wmax].transpose(0, 2, 3, 1)
            .reshape(nt * BLOCKS_PER_TILE, wmax)[:n_blocks])


def _append_tail_bits(code: np.ndarray, total_bits: int,
                      tail_packed: np.ndarray, tail_bits: int) -> np.ndarray:
    """Append a short packed bit run at ``total_bits`` (host, boundary-OR)."""
    lead = total_bits & 7
    out_bytes = (total_bits + tail_bits + 7) // 8 + 2  # +2 read-ahead pad
    out = np.zeros(out_bytes, dtype=np.uint8)
    n_full = (total_bits + 7) // 8
    out[:n_full] = code[:n_full]
    shifted = np.zeros(((lead + tail_bits + 7) // 8) * 8, dtype=np.uint8)
    shifted[lead:lead + tail_bits] = np.unpackbits(tail_packed)[:tail_bits]
    packed = np.packbits(shifted)
    base = total_bits >> 3
    out[base] |= packed[0]  # the only byte both runs may share
    out[base + 1: base + packed.size] = packed[1:]
    return out


def encode_symbols_hybrid(data: np.ndarray, block_size: int = 64,
                          n_threads: int = 0,
                          interpret: bool = False) -> EncodedStream:
    """Hybrid device/host encode -> EncodedStream (byte-identical to native).

    Stage 1 packs per-block word rows on the TPU; stage 2 merges them into
    the contiguous stream with the multithreaded C++ bit-memcpy. The
    canonical table is built on the host (256 frequencies — table build is
    microseconds and must match the native tie-breaking exactly).

    A partial tail block (``n % 64`` symbols) is packed on the host and
    bit-appended, mirroring ``core.encode.encode_symbols`` semantics: the
    offset index covers complete blocks only.
    """
    if block_size != BLOCK_SYMBOLS:
        raise ValueError(
            f"hybrid encoder supports block_size={BLOCK_SYMBOLS} only "
            "(the kernel is specialized to 8x8 blocks); use native")
    data = np.ascontiguousarray(data, dtype=np.uint8).ravel()
    if data.size == 0:
        raise ValueError("empty input")

    freqs = np.bincount(data, minlength=256).astype(np.int64)
    widths = native.code_lengths(freqs)
    codes = native.canonical_codes(widths)

    n_blocks = data.size // block_size
    if n_blocks == 0:  # nothing for the device to do
        return native.encode_symbols(data, block_size, n_threads)
    body = data[: n_blocks * block_size]

    # per-block bit counts (host): drives wmax, the merge, and the offsets
    bits_pb = (widths[body].reshape(n_blocks, block_size)
               .astype(np.uint32).sum(axis=1, dtype=np.uint32))
    if int(bits_pb.astype(np.int64).sum()) + 16 * (data.size % block_size) \
            >= 1 << 32:
        raise ValueError(
            "stream exceeds 2^32 bits — u32 block offsets overflow; "
            "split the input (e.g. per-frame or segmented MHTV)")
    wmax = int(bits_pb.max()) // 32 + 2  # ceil + 1 spare (merge bound check)
    min_w, max_w = used_width_band(widths)

    # stage 1 on device: pad the block axis to whole (8,128) tiles
    nb_pad = -(-n_blocks // BLOCKS_PER_TILE) * BLOCKS_PER_TILE
    nt = nb_pad // BLOCKS_PER_TILE
    padded = np.zeros(nb_pad * block_size, dtype=np.uint8)
    padded[: body.size] = body
    codes_pair, widths_pair = pack_code_tables(widths, codes)
    sym_tiled = _stage_symbols(jax.device_put(jnp.asarray(padded)), nt=nt)
    out = encode_rows(sym_tiled, jnp.asarray(codes_pair),
                      jnp.asarray(widths_pair), wmax=wmax,
                      min_w=min_w, max_w=max_w, interpret=interpret)
    rows = np.asarray(
        _rows_block_major(out, wmax=wmax, n_blocks=n_blocks)
    ).view(np.uint32)

    # stage 2 on host: bit-shift memcpy merge + offsets prefix sum
    code, offsets, total_bits = native.merge_rows(rows, bits_pb, n_threads)

    tail = data[n_blocks * block_size:]
    if tail.size:
        tail_packed, tail_offs = bitstream.pack_bits(tail, codes, widths)
        code = _append_tail_bits(
            code, total_bits, tail_packed, int(tail_offs[-1]))
    return EncodedStream(
        num_symbols=data.size,
        widths=np.asarray(widths, dtype=np.uint8),
        code_bytes=np.ascontiguousarray(code),
        block_offsets=offsets,
    )
