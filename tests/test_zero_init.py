"""Zero-init-delta variant (reference AAPLShaderTypes.h:110,
AAPLRenderer.m:449-473/1050-1068): block root bytes ship uncoded, their
stream slot is a zero delta, decode seeds prev with the root byte (realized
here as a mod-256 block add — kernel-agnostic)."""

import numpy as np
import pytest

from metalhuffman_tpu.core import delta
from metalhuffman_tpu.models import CodecConfig, ImageCodec
from metalhuffman_tpu.utils import fixtures


def test_split_apply_inverse():
    rng = np.random.default_rng(0)
    blocks = rng.integers(0, 256, (100, 64), dtype=np.uint8)
    deltas = delta.delta_encode_blocks(blocks)
    init, zeroed = delta.split_zero_init(deltas)
    assert (zeroed[:, 0] == 0).all()
    assert np.array_equal(init, deltas[:, 0])
    # decode-with-prev-0 then block add == decode-with-prev-init
    dec0 = delta.delta_decode_blocks(zeroed)
    assert np.array_equal(delta.apply_block_init(dec0, init), blocks)


@pytest.mark.parametrize("backend", ["native", "xla", "pallas"])
def test_roundtrip_zero_init(backend):
    img = fixtures.render_frame("bridge_512")
    cfg = CodecConfig(backend=backend, zero_init=True,
                      interpret=backend == "pallas")
    codec = ImageCodec(cfg)
    stream = codec.encode(img)
    assert stream.block_init is not None
    assert stream.block_init.size == stream.block_offsets.size
    out = np.asarray(codec.decode(stream, *img.shape))
    assert np.array_equal(out, img)


def test_container_roundtrip_zero_init():
    img = fixtures.render_frame("bridge_512")
    cfg = CodecConfig(backend="native", zero_init=True)
    codec = ImageCodec(cfg)
    blob = codec.encode_to_bytes(img)
    # a plain-config codec decodes it: the container mode is authoritative
    out = ImageCodec(CodecConfig(backend="native")).decode(blob)
    assert np.array_equal(out, img)


def test_zero_init_boosts_zero_count():
    img = fixtures.render_frame("bridge_512")
    plain = ImageCodec(CodecConfig(backend="native")).encode(img)
    zi = ImageCodec(CodecConfig(backend="native", zero_init=True)).encode(img)
    # the stream itself must not grow (zero is the most common delta on
    # smooth content; adding one per block can only shorten its code)
    assert zi.compressed_size <= plain.compressed_size
    # width of the zero symbol can only shrink
    assert zi.widths[0] <= plain.widths[0]


def test_zero_init_requires_delta():
    img = fixtures.render_frame("bridge_512")
    codec = ImageCodec(CodecConfig(delta=False, zero_init=True))
    with pytest.raises(ValueError):
        codec.encode(img)


def test_region_decode_zero_init():
    img = fixtures.render_frame("bridge_512")
    cfg = CodecConfig(backend="xla", zero_init=True)
    codec = ImageCodec(cfg)
    stream = codec.encode(img)
    got = codec.decode_region(stream, *img.shape, 40, 24, 64, 80)
    assert np.array_equal(got, img[40:104, 24:104])
