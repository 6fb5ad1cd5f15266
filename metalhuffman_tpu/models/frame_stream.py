"""Multi-frame (video) codec: batched and sharded decode of frame sequences.

The reference exists to serve full-screen video — 2048x1536 @ 30 FPS was the
goal (``README.md:9-11``) — but only ever decodes a single frame per display
tick. This module is the TPU-native generalization: encode a sequence of
same-sized frames, stage the whole batch on device, and decode every frame in
one fused program (``vmap`` over the frame axis), optionally sharded over a
``data x seq`` mesh (frames x block-ranges; ``parallel.shard_decode``).

On-disk: the MHTS container is a frame count + concatenated per-frame MHT1
records (``core.container``).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import bitstream, blocks, container
from ..ops import decode_xla, layout as layout_mod
from ..parallel import mesh as mesh_mod, shard_decode
from .image_codec import CodecConfig, ImageCodec

STREAM_MAGIC = b"MHTS"


def encode_frames(
    frames: np.ndarray | list[np.ndarray], config: CodecConfig | None = None
) -> list[container.EncodedStream]:
    """Encode a (T, H, W) stack (or list) of same-sized grayscale frames."""
    codec = ImageCodec(config)
    frames = np.asarray(frames)
    if frames.ndim != 3:
        raise ValueError("frames must be (T, H, W)")
    return [codec.encode(f) for f in frames]


def write_stream(streams: list[container.EncodedStream], height: int, width: int,
                 config: CodecConfig | None = None) -> bytes:
    """Serialize a frame sequence to the MHTS container."""
    cfg = config or CodecConfig()
    out = [STREAM_MAGIC, struct.pack("<I", len(streams))]
    for s in streams:
        rec = container.write_frame(s, height, width, cfg.block_dim, cfg.delta)
        out.append(struct.pack("<I", len(rec)))
        out.append(rec)
    return b"".join(out)


def read_stream(data: bytes):
    """Parse MHTS -> (streams, height, width, block_dim, delta)."""
    if data[:4] != STREAM_MAGIC:
        raise ValueError("not an MHTS container")
    (count,) = struct.unpack_from("<I", data, 4)
    pos = 8
    streams, geom = [], None
    for _ in range(count):
        (rec_len,) = struct.unpack_from("<I", data, pos)
        pos += 4
        stream, h, w, bd, delta = container.read_frame(data[pos : pos + rec_len])
        pos += rec_len
        if geom is None:
            geom = (h, w, bd, delta)
        elif geom != (h, w, bd, delta):
            raise ValueError("MHTS frames must share geometry")
        streams.append(stream)
    if geom is None:
        raise ValueError("empty MHTS stream")
    return streams, *geom


@dataclass(frozen=True)
class PreparedBatch:
    """Device-resident batch decode inputs (frame axis leading)."""

    height: int
    width: int
    n_blocks: int  # per frame (unpadded)
    words_per_row: int
    words_b: jnp.ndarray  # (T, n_words) uint32
    offsets_b: jnp.ndarray  # (T, nb_padded) int32
    t1_b: jnp.ndarray  # (T, 2^k1) int32
    t2_b: jnp.ndarray  # (T, t2_size) int32


def prepare_batch(
    streams: list[container.EncodedStream],
    height: int,
    width: int,
    config: CodecConfig | None = None,
    pad_blocks_to: int = 1,
) -> PreparedBatch:
    """Stage a batch of same-geometry streams as stacked padded device arrays.

    Word counts and T2 sizes are padded to the batch max (rounded up to a
    power of two to bound recompiles across batches).
    """
    cfg = config or CodecConfig()
    prepared = [decode_xla.prepare_stream(s) for s in streams]
    wpr = max(p[2] for p in prepared)
    prepared = [decode_xla.prepare_stream(s, width=wpr) for s in streams]

    def pow2(n: int) -> int:
        p = 1
        while p < n:
            p *= 2
        return p

    n_words = pow2(max(p[0].size for p in prepared))
    nb = max(s.block_offsets.size for s in streams)
    nb_padded = nb + ((-nb) % pad_blocks_to)

    tables = [
        decode_xla.prepare_tables(s.widths, cfg.table1_bits, cfg.table2_bits)
        for s in streams
    ]
    t2_size = pow2(max(t2.size for _, t2 in tables))

    T = len(streams)
    words_b = np.zeros((T, n_words), np.uint32)
    offs_b = np.zeros((T, nb_padded), np.int32)
    t1_b = np.stack([t1 for t1, _ in tables])
    t2_b = np.zeros((T, t2_size), np.int32)
    for i, (w, o, _) in enumerate(prepared):
        words_b[i, : w.size] = w
        offs_b[i, : o.size] = o
        t2_b[i, : tables[i][1].size] = tables[i][1]
    return PreparedBatch(
        height, width, nb, wpr,
        jnp.asarray(words_b), jnp.asarray(offs_b), jnp.asarray(t1_b),
        jnp.asarray(t2_b),
    )


@partial(jax.jit, static_argnames=("width", "num_steps", "delta", "height_px", "width_px", "n_blocks", "block_dim"))
def _decode_batch_jit(words_b, offsets_b, t1_b, t2_b, *, width, num_steps, delta,
                      height_px, width_px, n_blocks, block_dim):
    def per_frame(words, offsets, t1, t2):
        rows, bit_init = layout_mod.build_layout_jax(words, offsets, width)
        blk = decode_xla.decode_blocks(
            rows, bit_init, t1, t2, num_steps=num_steps, delta=delta
        )[:n_blocks]
        return blocks.blocks_to_image_jax(blk, height_px, width_px, block_dim)

    return jax.vmap(per_frame)(words_b, offsets_b, t1_b, t2_b)


def decode_batch(prep: PreparedBatch, config: CodecConfig | None = None):
    """Single-device batched decode -> (T, H, W) uint8 device array."""
    cfg = config or CodecConfig()
    return _decode_batch_jit(
        prep.words_b, prep.offsets_b, prep.t1_b, prep.t2_b,
        width=prep.words_per_row, num_steps=cfg.block_size, delta=cfg.delta,
        height_px=prep.height, width_px=prep.width, n_blocks=prep.n_blocks,
        block_dim=cfg.block_dim,
    )


def decode_batch_sharded(prep: PreparedBatch, mesh=None,
                         config: CodecConfig | None = None):
    """Sharded batched decode on a ``data x seq`` mesh -> (T, nb, 64) blocks.

    Frames shard over ``data``; block ranges over ``seq``. Returns decoded
    blocks (not images) sharded in stream order; crop to ``prep.n_blocks``
    and reassemble with ``core.blocks.blocks_to_image`` per frame.
    """
    cfg = config or CodecConfig()
    if mesh is None:
        mesh = mesh_mod.make_mesh_2d()
    return shard_decode.decode_frames_sharded(
        prep.words_b, prep.offsets_b, prep.t1_b, prep.t2_b,
        mesh=mesh, width=prep.words_per_row, num_steps=cfg.block_size,
        delta=cfg.delta,
    )
