"""Fixture configs roundtrip (tier-1 of the reference's test strategy) + IO."""

import numpy as np
import pytest

from metalhuffman_tpu.models import CodecConfig, ImageCodec
from metalhuffman_tpu.utils import fixtures, imageio


@pytest.mark.parametrize("config", fixtures.SMALL_CONFIGS)
def test_small_fixture_roundtrip(config):
    img = fixtures.render_frame(config)
    ImageCodec(CodecConfig(backend="xla")).roundtrip_verify(img)


@pytest.mark.parametrize("config", ["8x8_ident_2048", "large_random", "image3"])
@pytest.mark.slow
def test_large_fixture_roundtrip(config):
    img = fixtures.render_frame(config)
    codec = ImageCodec(CodecConfig(backend="xla"))
    stream = codec.roundtrip_verify(img)
    if config.startswith("image"):
        assert stream.compressed_size < img.size


@pytest.mark.parametrize("backend", ["xla", "pallas", "native"])
def test_real_photo_512_roundtrip(backend):
    # REAL photographic bits (content statistics matter: PERF.md shows
    # photo vs synthetic changes throughput) — not a synthetic generator.
    img = fixtures.render_frame("bridge_512")
    assert img.shape == (512, 512)
    ImageCodec(CodecConfig(
        backend=backend, interpret=backend == "pallas")).roundtrip_verify(img)


@pytest.mark.slow
def test_real_photo_roundtrip_and_size_parity():
    # The reference's default config decodes this exact 2048x1536 photo
    # (HuffRenderFrame.m:593-613); its verify path byte-compares every pixel
    # (AAPLRenderer.m:1849-1876). Compressed size in the reference wire
    # format (8B header + 256B table + code bytes + 2B pad) is fixed
    # accounting for this image — an encoder-parity regression gate.
    img = fixtures.render_frame("bridge")
    assert img.shape == (1536, 2048)
    stream = ImageCodec(CodecConfig(backend="native")).roundtrip_verify(img)
    assert stream.compressed_size == 1923654  # 61.2% of 3.1 MB


def test_unknown_config_raises():
    with pytest.raises(ValueError):
        fixtures.render_frame("nope")


def test_all_configs_enumerated():
    assert set(fixtures.SMALL_CONFIGS) | set(fixtures.LARGE_CONFIGS) == set(
        fixtures.CONFIGS
    )
    # capability parity: the reference enumerates 17 configs
    assert len(fixtures.CONFIGS) >= 16


def test_raw_gray_io(tmp_path):
    img = fixtures.render_frame("16x16_ident")
    p = tmp_path / "f.gray"
    imageio.save_grayscale(img, p)
    np.testing.assert_array_equal(imageio.load_grayscale(p), img)


def test_png_io(tmp_path):
    pytest.importorskip("PIL")
    img = fixtures.render_frame("8x8_ident")
    p = tmp_path / "f.png"
    imageio.save_grayscale(img, p)
    np.testing.assert_array_equal(imageio.load_grayscale(p), img)


def test_tga_reader(tmp_path):
    import struct

    img = fixtures.render_frame("16x16_ident")
    h, w = img.shape
    # 8-bit grayscale, origin top-left (descriptor 0x20)
    header = bytes([0, 0, 3]) + b"\0" * 9 + struct.pack("<HH", w, h) + bytes([8, 0x20])
    p = tmp_path / "f.tga"
    p.write_bytes(header + img.tobytes())
    np.testing.assert_array_equal(imageio.load_tga(p), img)
    # bottom-left origin variant round-flips
    header_bl = bytes([0, 0, 3]) + b"\0" * 9 + struct.pack("<HH", w, h) + bytes([8, 0])
    p.write_bytes(header_bl + img[::-1].tobytes())
    np.testing.assert_array_equal(imageio.load_tga(p), img)


def test_profiler_trace_context(tmp_path):
    import jax.numpy as jnp

    from metalhuffman_tpu.utils import profiling

    with profiling.trace(str(tmp_path / "trace")) as d:
        float(jnp.sum(jnp.ones((8, 8))))
    assert (tmp_path / "trace").exists()


def test_timer_and_time_fn():
    from metalhuffman_tpu.utils import profiling

    t = profiling.Timer("x")
    with t:
        pass
    t.add_bytes(1000)
    assert t.count == 1 and "GB/s" in t.report()

    dt, gbps = profiling.time_fn(lambda x: x + 1, np.float32(1), iters=2, warmup=1,
                                 payload_bytes=100)
    assert dt > 0 and gbps > 0
