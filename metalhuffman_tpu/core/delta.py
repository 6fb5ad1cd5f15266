"""Per-block signed-byte delta precoding (NumPy, vectorized).

Reference semantics (``HuffmanUtil.cpp:21-85`` applied per 8x8 block at
``AAPLRenderer.m:432-515``): within each block the first byte is emitted
literally and every following byte is the wrapping difference from its
predecessor; reconstruction is a running sum mod 256 that restarts at each
block root (the GPU shader's ``prevSymbol`` accumulator,
``AAPLShaders.metal:260-265``).
"""

from __future__ import annotations

import numpy as np


def delta_encode_blocks(blocks: np.ndarray) -> np.ndarray:
    """Delta-encode along the last axis; shape (..., block_len) uint8."""
    blocks = np.asarray(blocks, dtype=np.uint8)
    out = blocks.copy()
    out[..., 1:] = blocks[..., 1:] - blocks[..., :-1]  # uint8 wraps mod 256
    return out


def delta_decode_blocks(deltas: np.ndarray) -> np.ndarray:
    """Inverse of :func:`delta_encode_blocks` (cumsum mod 256 per block)."""
    deltas = np.asarray(deltas, dtype=np.uint8)
    return np.cumsum(deltas, axis=-1, dtype=np.int64).astype(np.uint8)
