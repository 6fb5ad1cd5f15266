"""Corruption / integrity handling: decoders terminate, CRC catches damage."""

import numpy as np
import pytest

from metalhuffman_tpu.core import container
from metalhuffman_tpu.models import CodecConfig, ImageCodec
from metalhuffman_tpu.ops import decode_xla


def _img(seed=0, shape=(32, 48)):
    return np.random.default_rng(seed).integers(0, 256, shape, np.uint8)


def test_crc_catches_corrupt_code_bytes():
    img = _img()
    codec = ImageCodec(CodecConfig(backend="xla"))
    blob = bytearray(codec.encode_to_bytes(img))
    # flip a bit in the code stream (past head 26 + core header 264)
    blob[26 + 264 + 10] ^= 0x40
    with pytest.raises(ValueError, match="CRC-32"):
        codec.decode(bytes(blob))


def test_device_decode_of_garbage_terminates():
    # A corrupt stream must never hang or index out of bounds — the interval
    # decoder always advances >= 1 bit/symbol and clamps its table indices.
    img = _img(1)
    codec = ImageCodec(CodecConfig(backend="xla"))
    stream = codec.encode(img)
    bad = container.EncodedStream(
        num_symbols=stream.num_symbols,
        widths=stream.widths,
        code_bytes=np.random.default_rng(2).integers(
            0, 256, stream.code_bytes.size, np.uint8
        ).astype(np.uint8),
        block_offsets=stream.block_offsets,
    )
    out = np.asarray(decode_xla.decode_stream(bad, delta=True))
    assert out.shape == (stream.block_offsets.size, 64)  # garbage but bounded


def test_truncated_container_raises():
    img = _img(3)
    blob = ImageCodec(CodecConfig(backend="xla")).encode_to_bytes(img)
    with pytest.raises(ValueError):
        container.read_frame(blob[: len(blob) // 2])
    with pytest.raises(ValueError):
        container.read_frame(b"XXXX" + blob[4:])


def test_decode_without_crc_still_works():
    img = _img(4)
    codec = ImageCodec(CodecConfig(backend="xla"))
    stream = codec.encode(img)
    blob = container.write_frame(stream, *img.shape, 8, True)  # crc=0
    out = codec.decode(blob)
    np.testing.assert_array_equal(out, img)
