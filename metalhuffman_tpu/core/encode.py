"""High-level encode facade (NumPy path).

Analog of ``HuffmanUtil::encodeHuffman`` (``HuffmanUtil.cpp:1051-1131``): count
frequencies, build canonical codes, pack the bitstream, and record the bit
offset of every block root (one block = ``block_dim**2`` symbols).
"""

from __future__ import annotations

import numpy as np

from . import bitstream, canonical
from .container import EncodedStream


def encode_symbols(symbols: np.ndarray, block_size: int = 64) -> EncodedStream:
    """Canonical-Huffman encode a symbol stream with a per-block offset index.

    The offset index covers only complete blocks (``n // block_size``); a
    partial tail is encoded into the bitstream (serial decoders can reach it)
    but the block-parallel device decoders decode whole blocks only — image
    pipelines always feed zero-padded full blocks (``core.blocks``).
    """
    symbols = np.asarray(symbols, dtype=np.uint8).ravel()
    if symbols.size == 0:
        raise ValueError("empty input")
    freqs = canonical.symbol_frequencies(symbols)
    widths = canonical.huffman_code_lengths(freqs)
    codes = canonical.canonical_codes(widths)
    packed, offsets = bitstream.pack_bits(symbols, codes, widths)
    block_offs = bitstream.block_bit_offsets(offsets, block_size)
    return EncodedStream(
        num_symbols=symbols.size,
        widths=widths,
        code_bytes=packed,
        block_offsets=block_offs,
    )
