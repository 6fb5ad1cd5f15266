"""Shared-table video mode: one canonical table, one fused batch decode."""

import numpy as np
import pytest

from metalhuffman_tpu.models import CodecConfig, frame_stream


def _frames(t, h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    out = []
    for i in range(t):
        img = 100 + 60 * np.sin((xx + 5 * i) / 17.0) * np.cos(yy / 13.0)
        out.append(np.clip(img + rng.normal(0, 2, (h, w)), 0, 255).astype(np.uint8))
    return np.stack(out)


def test_shared_roundtrip_interpret():
    cfg = CodecConfig(backend="pallas", interpret=True)
    frames = _frames(4, 32, 48)
    stream = frame_stream.encode_frames_shared(frames, cfg)
    out = np.asarray(frame_stream.decode_frames_shared(stream, 4, 32, 48, cfg))
    np.testing.assert_array_equal(out, frames)


def test_shared_stream_is_one_table():
    cfg = CodecConfig(backend="pallas", interpret=True)
    frames = _frames(3, 24, 24, seed=5)
    stream = frame_stream.encode_frames_shared(frames, cfg)
    # 3 frames x (24x24 -> 3x3 blocks of 8x8) = 27 blocks in one stream
    assert stream.block_offsets.size == 27
    assert stream.widths.shape == (256,)


def test_shared_prepare_step_split():
    cfg = CodecConfig(backend="pallas", interpret=True)
    frames = _frames(2, 16, 32, seed=7)
    stream = frame_stream.encode_frames_shared(frames, cfg)
    prep = frame_stream.prepare_shared(stream, 2, 16, 32, cfg)
    out1 = np.asarray(frame_stream.decode_shared_step(prep, cfg))
    out2 = np.asarray(frame_stream.decode_shared_step(prep, cfg))
    np.testing.assert_array_equal(out1, frames)
    np.testing.assert_array_equal(out2, frames)


def test_shared_image_layout_path_interpret():
    # width 1024 -> h2=1 exercises the image-layout kernel (interpret mode)
    cfg = CodecConfig(backend="pallas", interpret=True)
    frames = _frames(2, 16, 1024, seed=9)
    stream = frame_stream.encode_frames_shared(frames, cfg)
    prep = frame_stream.prepare_shared(stream, 2, 16, 1024, cfg)
    assert prep.h2 == 1
    out = np.asarray(frame_stream.decode_shared_step(prep, cfg))
    np.testing.assert_array_equal(out, frames)
    raw = frame_stream.decode_shared_step(prep, cfg, raw=True)
    view = frame_stream.frames_from_raw(raw, 2, 16, 1024)
    np.testing.assert_array_equal(view, frames)


def test_shared_image_layout_h2_2_interpret():
    cfg = CodecConfig(backend="pallas", interpret=True)
    frames = _frames(1, 8, 2048, seed=10)
    stream = frame_stream.encode_frames_shared(frames, cfg)
    prep = frame_stream.prepare_shared(stream, 1, 8, 2048, cfg)
    assert prep.h2 == 2
    out = np.asarray(frame_stream.decode_shared_step(prep, cfg))
    np.testing.assert_array_equal(out, frames)


def test_shared_sharded_image_path():
    from metalhuffman_tpu.ops import decode_pallas
    from metalhuffman_tpu.parallel import mesh as mesh_mod

    cfg = CodecConfig(backend="pallas", interpret=True)
    frames = _frames(2, 64, 1024, seed=11)  # h2=1; 16 blk-rows -> 2 progs... pads
    stream = frame_stream.encode_frames_shared(frames, cfg)
    m = mesh_mod.make_mesh(2)
    out, nb, h2 = frame_stream.decode_shared_sharded(
        stream, 2, 64, 1024, mesh=m, config=cfg)
    assert h2 == 1
    img32 = np.asarray(decode_pallas.images_from_strips(out, 2, 64, 1024))
    view = img32.reshape(-1, 256).view(np.uint8).reshape(2, 64, 1024)
    np.testing.assert_array_equal(view, frames)


def test_shared_sharded_generic_path():
    from metalhuffman_tpu.ops import decode_pallas
    from metalhuffman_tpu.parallel import mesh as mesh_mod

    cfg = CodecConfig(backend="pallas", interpret=True)
    frames = _frames(2, 40, 48, seed=12)  # width not 1024-multiple
    stream = frame_stream.encode_frames_shared(frames, cfg)
    m = mesh_mod.make_mesh(2)
    out, nb, h2 = frame_stream.decode_shared_sharded(
        stream, 2, 40, 48, mesh=m, config=cfg)
    assert h2 == 0
    blk = np.asarray(decode_pallas.unpack_to_blocks(out, nb))
    from metalhuffman_tpu.core import blocks as blocks_mod

    nbf = nb // 2
    for i in range(2):
        img = blocks_mod.blocks_to_image(blk[i * nbf : (i + 1) * nbf], 40, 48)
        np.testing.assert_array_equal(img, frames[i])


def test_shared_rejects_bad_shapes():
    cfg = CodecConfig()
    with pytest.raises(ValueError):
        frame_stream.encode_frames_shared(np.zeros((4, 4), np.uint8), cfg)
