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


def split_zero_init(deltas: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Zero-init-delta transform: (..., block_len) deltas -> (init, zeroed).

    The reference's ``IMPL_DELTAS_AND_INIT_ZERO_DELTA_BEFORE_HUFF_ENCODING``
    variant (``AAPLShaderTypes.h:110``, ``AAPLRenderer.m:449-473``): each
    block's first delta (its literal root byte) moves to a raw side array
    and the stream slot becomes 0 — boosting the zero-delta count so the
    canonical tree spends fewer bits on it; the root byte ships uncoded.
    """
    d = np.asarray(deltas, dtype=np.uint8).copy()
    init = d[..., 0].copy()
    d[..., 0] = 0
    return init, d


def apply_block_init(blocks: np.ndarray, init: np.ndarray) -> np.ndarray:
    """Fold init bytes back into zero-init-decoded blocks.

    Initializing the decoder's ``prev`` accumulator to the block's init
    byte (the reference seeds the render target's R channel with it,
    ``AAPLRenderer.m:1050-1068``) is equivalent to decoding with prev=0 and
    adding the init byte to every output byte of the block mod 256 — which
    keeps every decode kernel unchanged.
    """
    blocks = np.asarray(blocks, dtype=np.uint8)
    return (blocks + np.asarray(init, dtype=np.uint8)[..., None]).astype(
        np.uint8)
