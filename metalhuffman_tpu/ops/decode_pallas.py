"""Pallas TPU decode kernel: all blocks in parallel, one fused 64-step loop.

This replaces the reference's five chained fragment-shader passes
(``AAPLShaders.metal:291-445``, pass chain ``AAPLRenderer.m:1192-1569``) with a
single kernel: the grid tiles the block axis, each program holds a
(8, 128)-lane tile of 1024 blocks entirely in VMEM/registers, and a 64-step
``fori_loop`` decodes one symbol per block per step. The carry state the Metal
code threads through a texture attachment ({numBitsRead, prevSymbol},
``AAPLShaders.metal:313-326,357-362``) lives in loop-carried vregs.

TPU-specific design (probed on hardware; see SURVEY.md section 7 hard parts):

- **No per-lane byte addressing.** Blocks are pre-staged as aligned u32 word
  rows (ops.layout); the per-step fetch is a branchless one-hot select over the
  W-word row plus a two-word funnel shift (variable per-lane shifts are native
  VPU ops).
- **No big-table gathers.** Mosaic only supports single-vreg (8,128) lane
  gathers, so instead of the reference's two-level 8/8-bit LUT
  (``HuffmanUtil.cpp:338-667``) the kernel decodes by *canonical interval
  arithmetic*: left-justified canonical codes partition the 16-bit window space
  into per-length regions with monotone boundaries, so

      width(window) = 1 + #{L in 2..16 : window >= B_L}          (15 scalar cmps)
      index         = adj[width] + (window >> (16 - width))      (one 16-gather)
      symbol        = syms_sorted[index]                         (two 128-gathers)

  This is uniform over all code lengths — the T2 escape branch of the
  reference (``AAPLShaders.metal:164-170``) disappears entirely.
- Zero words decode safely (width/index clamp to region 0), so padded lanes
  and padded blocks never index out of bounds.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import bitstream, canonical
from . import layout as layout_mod

LANES = 128
SUBLANES = 8
TILE_BLOCKS = SUBLANES * LANES  # 1024 blocks per grid step


@dataclass(frozen=True)
class CanonicalMeta:
    """Device-ready canonical-interval decode parameters."""

    bounds: np.ndarray  # (1, 16) int32: B_L, left-justified start of length-L region
    adj: np.ndarray  # (8, 128) int32: lanes 0..15 hold cum_L - first_code_L
    syms_lo: np.ndarray  # (8, 128) int32: sorted symbols 0..127 (canonical order)
    syms_hi: np.ndarray  # (8, 128) int32: sorted symbols 128..255


def canonical_meta(widths: np.ndarray) -> CanonicalMeta:
    """Precompute interval-decode parameters from the 256-byte width table."""
    widths = np.asarray(widths, dtype=np.int64)
    counts = np.bincount(widths[widths > 0], minlength=17)  # counts[L]
    first_rj = np.zeros(17, dtype=np.int64)  # right-justified first code per L
    code = 0
    for L in range(1, 17):
        first_rj[L] = code
        code = (code + int(counts[L])) << 1
    cum = np.zeros(17, dtype=np.int64)
    np.cumsum(counts[:16], out=cum[1:])

    bounds = np.zeros((1, 16), dtype=np.int32)
    adj16 = np.zeros(16, dtype=np.int32)
    for L in range(1, 17):
        bounds[0, L - 1] = int(first_rj[L] << (16 - L)) & 0xFFFFFFFF
        adj16[L - 1] = int(cum[L] - first_rj[L])

    # Sorted symbol list in canonical (width, symbol) order.
    active = np.nonzero(widths)[0]
    order = np.lexsort((active, widths[active]))
    syms = np.zeros(256, dtype=np.int32)
    syms[: active.size] = active[order]

    def vreg(x16_or_128):
        out = np.zeros((SUBLANES, LANES), dtype=np.int32)
        out[:, : x16_or_128.size] = x16_or_128[None, :]
        return out

    return CanonicalMeta(
        bounds=bounds,
        adj=vreg(adj16),
        syms_lo=vreg(syms[:128]),
        syms_hi=vreg(syms[128:]),
    )


def _gather128(table_vreg, idx):
    """Per-lane gather from a (8,128) replicated table; idx values 0..127."""
    return jnp.take_along_axis(table_vreg, idx, axis=1)


def _decode_kernel(bounds_ref, rows_ref, init_ref, meta_ref, out_ref, *,
                   num_steps: int, width: int, delta: bool):
    from jax.experimental import pallas as pl  # noqa: F401  (kept local: kernel-only dep)

    rows = rows_ref[0]  # (W, 8, 128) int32 big-endian words
    adj_tab = meta_ref[0]
    syms_lo = meta_ref[1]
    syms_hi = meta_ref[2]

    iota_w = jax.lax.broadcasted_iota(jnp.int32, (width, SUBLANES, LANES), 0)

    def step(i, carry):
        bits, prev = carry
        wi = jax.lax.shift_right_logical(bits, 5)
        oh0 = iota_w == wi[None]
        oh1 = iota_w == (wi + 1)[None]
        w0 = jnp.sum(jnp.where(oh0, rows, 0), axis=0)
        w1 = jnp.sum(jnp.where(oh1, rows, 0), axis=0)
        s = bits & 31
        # Left-justified 32-bit window; (w1 >> 1) >> (31 - s) avoids >>32 at s=0.
        hi32 = jax.lax.shift_left(w0, s) | jax.lax.shift_right_logical(
            jax.lax.shift_right_logical(w1, 1), 31 - s
        )
        window = jax.lax.shift_right_logical(hi32, 16)  # int32 in [0, 65535]

        # Code width: count region boundaries at or below the window.
        w = jnp.ones_like(window)
        for L in range(2, 17):
            w = w + (window >= bounds_ref[0, L - 1]).astype(jnp.int32)

        # Symbol index within the canonical order, then the symbol itself.
        idx = _gather128(adj_tab, w - 1) + jax.lax.shift_right_logical(
            window, 16 - w
        )
        lo = _gather128(syms_lo, idx & 127)
        hi = _gather128(syms_hi, idx & 127)
        sym = jnp.where(idx >= 128, hi, lo)

        if delta:
            prev = (prev + sym) & 0xFF
            out = prev
        else:
            out = sym
        out_ref[0, i] = out
        return bits + w, prev

    bits0 = init_ref[0]
    prev0 = jnp.zeros((SUBLANES, LANES), jnp.int32)
    jax.lax.fori_loop(0, num_steps, step, (bits0, prev0))


@partial(jax.jit, static_argnames=("num_steps", "width", "delta", "interpret"))
def decode_tiles(rows_tiled, init_tiled, bounds, meta, *, num_steps: int,
                 width: int, delta: bool, interpret: bool = False):
    """Run the decode kernel over pre-tiled inputs.

    Args:
        rows_tiled: (nt, W, 8, 128) int32 word rows per block.
        init_tiled: (nt, 8, 128) int32 starting bit offset within each row.
        bounds: (1, 16) int32 region boundaries (SMEM).
        meta: (3, 8, 128) int32 [adj, syms_lo, syms_hi].

    Returns:
        (nt, num_steps, 8, 128) int32 decoded symbols.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nt = rows_tiled.shape[0]
    kernel = partial(
        _decode_kernel, num_steps=num_steps, width=width, delta=delta
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(
                (1, width, SUBLANES, LANES),
                lambda i, *_: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, SUBLANES, LANES), lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3, SUBLANES, LANES), lambda i, *_: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, num_steps, SUBLANES, LANES),
            lambda i, *_: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (nt, num_steps, SUBLANES, LANES), jnp.int32
        ),
        interpret=interpret,
    )(bounds, rows_tiled, init_tiled, meta)


def tile_layout_jax(code_words_be, block_offsets, width: int):
    """Device-side layout gather producing kernel-ready tiles.

    Returns (rows_tiled (nt,W,8,128) int32, init_tiled (nt,8,128) int32,
    n_blocks). Blocks beyond n_blocks are zero-padded (decode garbage safely).
    """
    nb = block_offsets.shape[0]
    nt = -(-nb // TILE_BLOCKS)
    offs = jnp.pad(block_offsets.astype(jnp.int32), (0, nt * TILE_BLOCKS - nb))
    offs = offs.reshape(nt, SUBLANES, LANES)
    word_start = offs >> 5
    idx = word_start[:, None] + jnp.arange(width, dtype=jnp.int32).reshape(
        1, width, 1, 1
    )
    rows = jnp.take(
        code_words_be.astype(jnp.int32), idx, mode="clip"
    )
    return rows, offs & 31, nb


def decode_stream_pallas(stream, *, delta: bool = True, block_size: int = 64,
                         interpret: bool = False):
    """Full decode of an EncodedStream via the Pallas kernel -> (nblocks, 64)."""
    meta = canonical_meta(stream.widths)
    total_bits = 8 * (stream.code_bytes.size - bitstream.READ_AHEAD_PAD_BYTES)
    width = layout_mod.words_per_block(
        layout_mod.max_block_bits(stream.block_offsets, total_bits),
        symbols_per_block=block_size,
    )
    words = bitstream.bytes_to_be_words(stream.code_bytes, pad_words=width)
    rows, init, nb = tile_layout_jax(
        jnp.asarray(words), jnp.asarray(stream.block_offsets.astype(np.int32)),
        width,
    )
    meta_stack = jnp.asarray(
        np.stack([meta.adj, meta.syms_lo, meta.syms_hi]), dtype=jnp.int32
    )
    out = decode_tiles(
        rows, init, jnp.asarray(meta.bounds), meta_stack,
        num_steps=block_size, width=width, delta=delta, interpret=interpret,
    )
    # (nt, steps, 8, 128) -> (nt, 8, 128, steps) -> (nb, steps)
    out = jnp.moveaxis(out, 1, -1).reshape(-1, block_size)[:nb]
    return out.astype(jnp.uint8)
