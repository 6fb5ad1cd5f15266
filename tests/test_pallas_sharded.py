"""Pallas kernel under shard_map on the 8-device CPU mesh (interpret mode)."""

import jax.numpy as jnp
import numpy as np

from metalhuffman_tpu.core import blocks, delta, encode_symbols
from metalhuffman_tpu.ops import decode_pallas
from metalhuffman_tpu.parallel import mesh as mesh_mod, shard_decode


def test_pallas_sharded_matches_input():
    rng = np.random.default_rng(0)
    # 2 tiles per shard x 8 shards = 16 tiles = 16384 blocks
    img = (np.add.outer(np.arange(1024), np.arange(1024)) % 239).astype(np.uint8)
    img = (img + rng.integers(0, 5, img.shape)).astype(np.uint8)
    blk = blocks.image_to_blocks(img)
    enc = encode_symbols(delta.delta_encode_blocks(blk).ravel(), block_size=64)

    meta, words, offsets, width = decode_pallas.prepare_stream(enc)
    rows, init, nb = decode_pallas.tile_layout_jax(
        jnp.asarray(words), jnp.asarray(offsets), width, group_tiles=2
    )
    assert rows.shape[0] % (8 * 2) == 0

    m = mesh_mod.make_mesh(8)
    out = shard_decode.decode_tiles_sharded(
        rows, init, jnp.asarray(meta.pair_table),
        mesh=m, width=width, bounds=meta.bounds, adj_inc=meta.adj_inc,
        group_tiles=2, interpret=True,
    )
    decoded = np.asarray(decode_pallas.unpack_to_blocks(out, nb))
    np.testing.assert_array_equal(decoded, blk)


def test_pallas_image_strips_sharded():
    # 1024-px-wide frame -> h2=1; 8 shards each emit contiguous image rows
    rng = np.random.default_rng(1)
    img = (np.add.outer(np.arange(512), np.arange(1024)) % 233).astype(np.uint8)
    img = (img + rng.integers(0, 5, img.shape)).astype(np.uint8)
    blk = blocks.image_to_blocks(img)
    enc = encode_symbols(delta.delta_encode_blocks(blk).ravel(), block_size=64)

    meta, words, offsets, width = decode_pallas.prepare_stream(enc)
    rows, init, nb = decode_pallas.tile_layout_images(
        jnp.asarray(words), jnp.asarray(offsets), width, h2=1, group_tiles=1
    )
    assert rows.shape[0] % 8 == 0  # 8 tiles, one per shard
    m = mesh_mod.make_mesh(8)
    strips = shard_decode.decode_tiles_images_sharded(
        rows, init, jnp.asarray(meta.pair_table),
        mesh=m, width=width, bounds=meta.bounds, adj_inc=meta.adj_inc,
        h2=1, group_tiles=1, interpret=True,
    )
    img32 = np.asarray(decode_pallas.images_from_strips(strips, 1, 512, 1024))
    out = img32.view(np.uint8).reshape(512, 1024)
    np.testing.assert_array_equal(out, img)


def test_pallas_sharded_delta2d():
    """delta2d under shard_map: in-kernel reconstruction per block needs no
    cross-chip state, so the mode shards exactly like the 1-D delta."""
    from metalhuffman_tpu.models import frame_stream
    from metalhuffman_tpu.models.image_codec import CodecConfig

    rng = np.random.default_rng(2)
    img = (np.add.outer(np.arange(512), np.arange(1024)) % 233).astype(np.uint8)
    img = (img + rng.integers(0, 5, img.shape)).astype(np.uint8)
    frames = img[None]

    cfg = CodecConfig(backend="pallas", interpret=True, delta2d=True)
    enc = frame_stream.encode_frames_shared(frames, cfg)
    m = mesh_mod.make_mesh(8)
    strips, nb, plan = frame_stream.decode_shared_sharded(
        enc, 1, 512, 1024, mesh=m, config=cfg)
    assert plan is not None
    img32 = np.asarray(decode_pallas.images_from_strips(strips, 1, 512, 1024))
    out = img32.view(np.uint8).reshape(512, 1024)
    np.testing.assert_array_equal(out, img)
