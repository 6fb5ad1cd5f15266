"""Sharded (multi-chip) Huffman decode via shard_map.

The reference's core parallelism idea — every 8x8 block independently decodable
via its bit-offset root (``HuffmanUtil.cpp:1102-1117``) — generalizes directly
to chips: a contiguous *range of blocks* goes to each device ("sequence
parallelism" over one bitstream, SURVEY.md section 2.6), while the code-word
stream and the decode tables are replicated over ICI. The decoded output is a
global array sharded in stream order on the block axis, so stream-order
assembly is just the output sharding — no explicit gather collective needed;
devices or hosts fetch whichever spans they want.

Two levels of parallelism:

- ``decode_blocks_sharded`` — one frame, blocks sharded over one mesh axis
  (the multi-chip analog of the reference's fragment-per-block grid).
- ``decode_frames_sharded`` — a batch of frames sharded over ``data`` with
  blocks sharded over ``seq`` on a 2-D mesh (the 30-FPS video stream case,
  scaled out).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

shard_map = jax.shard_map

from ..ops import decode_xla, layout as layout_mod
from .mesh import DATA_AXIS, SEQ_AXIS


def _pad_axis0(x, multiple: int):
    n = x.shape[0]
    pad = (-n) % multiple
    if pad:
        x = jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
    return x


@partial(
    jax.jit,
    static_argnames=("mesh", "num_steps", "delta", "width", "axis_name"),
)
def decode_blocks_sharded(
    words,
    offsets,
    t1,
    t2,
    *,
    mesh: Mesh,
    width: int,
    num_steps: int = 64,
    delta: bool = True,
    axis_name: str = SEQ_AXIS,
):
    """Decode one frame's blocks sharded over ``axis_name``.

    Args:
        words: (n_words,) uint32 big-endian code words (replicated; must
            include >= ``width`` trailing pad words).
        offsets: (n_blocks,) int32 per-block bit offsets (sharded).
        t1/t2: packed int32 split decode tables (replicated).
        width: words per block row (static; see ops.layout.words_per_block).

    Returns:
        (n_blocks_padded, num_steps) uint8, sharded on axis 0 in stream order.
        Rows past the original n_blocks are padding garbage — crop them.
    """
    n_shards = mesh.shape[axis_name]
    offsets = _pad_axis0(offsets.astype(jnp.int32), n_shards)

    def local_decode(words_l, offsets_l, t1_l, t2_l):
        rows, bit_init = layout_mod.build_layout_jax(words_l, offsets_l, width)
        return decode_xla.decode_blocks(
            rows, bit_init, t1_l, t2_l, num_steps=num_steps, delta=delta
        )

    fn = shard_map(
        local_decode,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(), P()),
        out_specs=P(axis_name, None),
    )
    return fn(words, offsets, t1, t2)


@partial(
    jax.jit,
    static_argnames=("mesh", "num_steps", "delta", "width", "data_axis", "seq_axis"),
)
def decode_frames_sharded(
    words_b,
    offsets_b,
    t1_b,
    t2_b,
    *,
    mesh: Mesh,
    width: int,
    num_steps: int = 64,
    delta: bool = True,
    data_axis: str = DATA_AXIS,
    seq_axis: str = SEQ_AXIS,
):
    """Decode a batch of frames on a 2-D ``data x seq`` mesh.

    Frames are sharded over ``data``; within each frame, block ranges are
    sharded over ``seq``. Per-frame streams/tables are padded to common static
    shapes by the caller (see models.frame_stream for the bucketing policy).

    Args:
        words_b: (B, n_words) uint32 — per-frame code words, sharded on B.
        offsets_b: (B, n_blocks) int32 — sharded on B and on the block axis.
        t1_b: (B, 2^k1) int32; t2_b: (B, t2_size) int32 — sharded on B.

    Returns:
        (B, n_blocks, num_steps) uint8 sharded (data, seq, None).
    """
    n_seq = mesh.shape[seq_axis]
    if offsets_b.shape[1] % n_seq:
        pad = (-offsets_b.shape[1]) % n_seq
        offsets_b = jnp.pad(offsets_b, ((0, 0), (0, pad)))

    def local_decode(words_l, offsets_l, t1_l, t2_l):
        def per_frame(words_f, offsets_f, t1_f, t2_f):
            rows, bit_init = layout_mod.build_layout_jax(words_f, offsets_f, width)
            return decode_xla.decode_blocks(
                rows, bit_init, t1_f, t2_f, num_steps=num_steps, delta=delta
            )

        return jax.vmap(per_frame)(words_l, offsets_l, t1_l, t2_l)

    fn = shard_map(
        local_decode,
        mesh=mesh,
        in_specs=(
            P(data_axis, None),
            P(data_axis, seq_axis),
            P(data_axis, None),
            P(data_axis, None),
        ),
        out_specs=P(data_axis, seq_axis, None),
    )
    return fn(words_b, offsets_b, t1_b, t2_b)


@partial(
    jax.jit,
    static_argnames=("mesh", "width", "bounds", "adj_inc", "num_steps",
                     "delta", "group_tiles", "axis_name", "interpret",
                     "delta2d"),
)
def decode_tiles_sharded(
    rows_tiled,
    init_tiled,
    pair_table,
    *,
    mesh: Mesh,
    width: int,
    bounds,
    adj_inc,
    num_steps: int = 64,
    delta: bool = True,
    group_tiles: int = 8,
    axis_name: str = SEQ_AXIS,
    interpret: bool = False,
    delta2d: bool = False,
):
    """Multi-chip Pallas decode: tile ranges sharded over ``axis_name``.

    The production multi-chip path — each chip runs the Pallas kernel on its
    contiguous tile range (canonical-table constants are compile-time, the
    pair table is replicated over ICI). Inputs come from
    ``ops.decode_pallas.tile_layout_jax``; the tile count must divide by
    ``mesh.shape[axis_name] * group_tiles`` (tile_layout pads to
    group_tiles; shard counts that divide the tile count evenly are the
    caller's choice of mesh).

    Returns packed output sharded on axis 0 (see decode_pallas.decode_tiles).
    """
    from ..ops import decode_pallas

    def local_decode(rows_l, init_l, pair_l):
        return decode_pallas.decode_tiles(
            rows_l, init_l, pair_l, width=width, bounds=bounds,
            adj_inc=adj_inc, num_steps=num_steps, delta=delta,
            group_tiles=group_tiles, interpret=interpret, delta2d=delta2d,
        )

    fn = shard_map(
        local_decode,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P()),
        out_specs=P(axis_name),
        check_vma=False,
    )
    return fn(rows_tiled, init_tiled, pair_table)


@partial(
    jax.jit,
    static_argnames=("mesh", "width", "bounds", "adj_inc", "h2", "delta",
                     "group_tiles", "axis_name", "interpret", "delta2d"),
)
def decode_tiles_images_sharded(
    rows_tiled,
    init_tiled,
    pair_table,
    *,
    mesh: Mesh,
    width: int,
    bounds,
    adj_inc,
    h2: int,
    delta: bool = True,
    group_tiles: int = 8,
    axis_name: str = SEQ_AXIS,
    interpret: bool = False,
    delta2d: bool = False,
):
    """Multi-chip image-layout decode: each chip emits final image rows.

    ``delta2d`` (mode 3) reconstructs in kernel registers per block, so it
    shards exactly like the 1-D delta — no cross-chip state.

    Because programs own contiguous image-row ranges in the strips layout
    (ops.decode_pallas.tile_layout_images), sharding tiles over ``axis_name``
    shards the OUTPUT image by contiguous row ranges — each chip holds its
    horizontal slice of the decoded frames, ready for row-parallel consumers
    (display, disk, further processing) with no reassembly collective.
    """
    from ..ops import decode_pallas

    def local_decode(rows_l, init_l, pair_l):
        return decode_pallas.decode_tiles_images(
            rows_l, init_l, pair_l, width=width, bounds=bounds,
            adj_inc=adj_inc, h2=h2, delta=delta, group_tiles=group_tiles,
            interpret=interpret, delta2d=delta2d,
        )

    fn = shard_map(
        local_decode,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P()),
        out_specs=P(axis_name),
        check_vma=False,
    )
    return fn(rows_tiled, init_tiled, pair_table)


def shard_stream_inputs(mesh: Mesh, words, offsets, t1, t2, axis_name: str = SEQ_AXIS):
    """Device_put inputs with the shardings decode_blocks_sharded expects.

    Placing inputs explicitly avoids a surprise re-shard inside jit; the
    offsets land as contiguous block ranges per device (stable block-range ->
    chip mapping keeps multi-host output deterministic, SURVEY.md section 7).
    """
    n_shards = mesh.shape[axis_name]
    offsets = _pad_axis0(jnp.asarray(offsets, jnp.int32), n_shards)
    rep = NamedSharding(mesh, P())
    seq = NamedSharding(mesh, P(axis_name))
    return (
        jax.device_put(words, rep),
        jax.device_put(offsets, seq),
        jax.device_put(t1, rep),
        jax.device_put(t2, rep),
    )
