"""Packed bitstream -> per-block padded word-row layout.

The wire stream stays packed (compressed-size parity with the reference); the
decoder first re-stages it as one aligned u32-word row per block so that the
symbol loop never does byte-granular addressing (SURVEY.md section 7 "hard
parts": TPUs hate per-lane byte gathers — pre-stage each block's code bytes as
aligned u32 words; the +2-byte read-ahead pad of ``HuffmanEncoder.cpp:371-378``
generalizes to one extra word here).

Row ``b`` holds ``words_per_block`` big-endian u32 words starting at word
``block_offsets[b] >> 5`` of the stream; the block's first code bit is bit
``block_offsets[b] & 31`` of its row. The row count is static per compiled
shape, so it is bucketed to limit recompiles across frames.
"""

from __future__ import annotations

import numpy as np

#: Row-size buckets (in u32 words). 34 covers the worst case for 64 symbols of
#: <= 16 bits each: ceil((31 + 64*16)/32) + 1 read-ahead word. Larger
#: blocks (block_dim > 8) extend past the table in multiples of 8 words.
WORD_BUCKETS = (6, 10, 14, 18, 26, 34)
MAX_WORDS_PER_BLOCK = WORD_BUCKETS[-1]


def words_per_block(max_block_bits: int, symbols_per_block: int = 64) -> int:
    """Smallest row bucket covering ``max_block_bits`` plus worst-case skew.

    The last window read within a block starts at most at bit
    ``31 + max_block_bits - 1`` of the row and touches that word plus the next.
    """
    hard_cap = (31 + symbols_per_block * 16 - 1) // 32 + 2
    need = min((31 + int(max_block_bits) - 1) // 32 + 2, hard_cap)
    for b in WORD_BUCKETS:
        if b >= need:
            return b
    # beyond the bucket table (large blocks): round up to a multiple of 8
    return min(-(-need // 8) * 8, max(hard_cap, MAX_WORDS_PER_BLOCK))


def max_block_bits(block_offsets: np.ndarray, total_bits: int) -> int:
    """Largest encoded block size in bits (offsets are ascending)."""
    offs = np.asarray(block_offsets, dtype=np.int64)
    if offs.size == 0:
        return 0
    ends = np.append(offs[1:], np.int64(total_bits))
    return int((ends - offs).max())


def build_layout_np(code_words_be: np.ndarray, block_offsets: np.ndarray, width: int):
    """NumPy layout: returns (rows (nblocks, width) uint32, bit_init (nblocks,) int32)."""
    words = np.asarray(code_words_be, dtype=np.uint32)
    offs = np.asarray(block_offsets, dtype=np.int64)
    word_start = offs >> 5
    idx = word_start[:, None] + np.arange(width, dtype=np.int64)[None, :]
    # Pad the word stream so every row index is in range.
    pad_to = int(idx.max(initial=0)) + 1
    if pad_to > words.size:
        words = np.concatenate([words, np.zeros(pad_to - words.size, np.uint32)])
    rows = words[idx]
    bit_init = (offs & 31).astype(np.int32)
    return rows, bit_init


def build_layout_jax(code_words_be, block_offsets, width: int):
    """JAX layout (device-side gather): same contract as :func:`build_layout_np`.

    ``code_words_be`` must already include enough trailing pad words
    (``bitstream.bytes_to_be_words(..., pad_words=width)`` guarantees it).
    """
    import jax.numpy as jnp

    offs = block_offsets.astype(jnp.int32)
    word_start = offs >> 5
    idx = word_start[:, None] + jnp.arange(width, dtype=jnp.int32)[None, :]
    rows = jnp.take(code_words_be, idx, mode="clip")
    return rows, (offs & 31).astype(jnp.int32)
