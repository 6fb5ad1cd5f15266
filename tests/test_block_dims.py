"""Non-default block dimensions across backends (HUFF_BLOCK_DIM analog)."""

import numpy as np
import pytest

from metalhuffman_tpu.models import CodecConfig, ImageCodec
from metalhuffman_tpu.ops import layout


@pytest.mark.parametrize("block_dim", [2, 4, 16])
@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_roundtrip_block_dims(block_dim, backend):
    rng = np.random.default_rng(block_dim)
    img = rng.integers(0, 200, (64, 96), np.uint8)
    codec = ImageCodec(CodecConfig(
        block_dim=block_dim, backend=backend, interpret=backend == "pallas"))
    codec.roundtrip_verify(img)


def test_words_per_block_large_blocks():
    # 256-symbol blocks can need 130 words — must not cap at the bucket table
    need_bits = 256 * 16
    w = layout.words_per_block(need_bits, symbols_per_block=256)
    assert w >= (31 + need_bits - 1) // 32 + 2
    # small cases still land on the bucket table
    assert layout.words_per_block(100, symbols_per_block=64) in layout.WORD_BUCKETS


def test_pallas_rejects_non_multiple_of_4():
    import jax.numpy as jnp

    from metalhuffman_tpu.ops import decode_pallas

    meta = decode_pallas.canonical_meta(
        np.array([8] * 256, np.uint8))
    with pytest.raises(ValueError, match="multiple of 4"):
        decode_pallas.decode_tiles(
            jnp.zeros((1, 6, 8, 128), jnp.int32),
            jnp.zeros((1, 8, 128), jnp.int32),
            jnp.asarray(meta.pair_table),
            width=6, bounds=meta.bounds, adj_inc=meta.adj_inc,
            num_steps=9, interpret=True,
        )
