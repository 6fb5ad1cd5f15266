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
    out, nb, plan = frame_stream.decode_shared_sharded(
        stream, 2, 64, 1024, mesh=m, config=cfg)
    assert plan is not None and plan.h2 == 1 and plan.w_pad == 1024
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
    out, nb, plan = frame_stream.decode_shared_sharded(
        stream, 2, 40, 48, mesh=m, config=cfg)
    assert plan is None
    blk = np.asarray(decode_pallas.unpack_to_blocks(out, nb))
    from metalhuffman_tpu.core import blocks as blocks_mod

    nbf = nb // 2
    for i in range(2):
        img = blocks_mod.blocks_to_image(blk[i * nbf : (i + 1) * nbf], 40, 48)
        np.testing.assert_array_equal(img, frames[i])


def test_shared_padded_image_path_1080p_interpret():
    # 1920 px is NOT a multiple of 1024: the ImagePlan pads each block row
    # from 240 to 256 blocks (h2=2) and the consumer crops — the geometry
    # that round 1 left on the generic slow path. Small frame count keeps
    # interpret mode fast; the real-chip rate is measured by perf_matrix.
    from metalhuffman_tpu.ops import decode_pallas

    cfg = CodecConfig(backend="pallas", interpret=True)
    plan = decode_pallas.image_plan_for(1080, 1920)
    assert plan is not None and (plan.h2, plan.bw, plan.bw_pad) == (2, 240, 256)
    frames = _frames(1, 48, 1920, seed=13)
    stream = frame_stream.encode_frames_shared(frames, cfg)
    prep = frame_stream.prepare_shared(stream, 1, 48, 1920, cfg)
    assert prep.h2 == 2 and prep.w_pad == 2048
    out = np.asarray(frame_stream.decode_shared_step(prep, cfg))
    np.testing.assert_array_equal(out, frames)
    raw = frame_stream.decode_shared_step(prep, cfg, raw=True)
    view = frame_stream.frames_from_raw(
        raw, 1, 48, 1920, w_pad=prep.w_pad, bh=prep.bh)
    np.testing.assert_array_equal(view, frames)


def test_shared_padded_image_path_odd_geometry_interpret():
    # non-multiple-of-8 height AND width: row and column crop both engage
    cfg = CodecConfig(backend="pallas", interpret=True)
    frames = _frames(2, 20, 1212, seed=14)  # bh=3 (24 rows), bw=152 -> pad 256
    stream = frame_stream.encode_frames_shared(frames, cfg)
    prep = frame_stream.prepare_shared(stream, 2, 20, 1212, cfg)
    assert prep.h2 == 2 and prep.bh == 3
    out = np.asarray(frame_stream.decode_shared_step(prep, cfg))
    np.testing.assert_array_equal(out, frames)
    raw = frame_stream.decode_shared_step(prep, cfg, raw=True)
    view = frame_stream.frames_from_raw(
        raw, 2, 20, 1212, w_pad=prep.w_pad, bh=prep.bh)
    np.testing.assert_array_equal(view, frames)


def test_shared_image_path_h2_3_g6_interpret():
    # 2560 px: h2=3 requires the g=6 grouping (sub=48) — a kernel shape no
    # other geometry exercises
    cfg = CodecConfig(backend="pallas", interpret=True)
    frames = _frames(1, 16, 2560, seed=15)
    stream = frame_stream.encode_frames_shared(frames, cfg)
    prep = frame_stream.prepare_shared(stream, 1, 16, 2560, cfg)
    assert prep.h2 == 3 and prep.group_tiles == 6
    out = np.asarray(frame_stream.decode_shared_step(prep, cfg))
    np.testing.assert_array_equal(out, frames)


def test_image_plan_selection():
    from metalhuffman_tpu.ops import decode_pallas as dp

    # exact fits keep g=8
    assert dp.image_plan_for(1536, 2048).group_tiles == 8
    # h2=3 (2560 px) needs g=6 (h2 | 8g)
    p = dp.image_plan_for(1536, 2560)
    assert (p.h2, p.group_tiles, p.bw_pad) == (3, 6, 384)
    # tiny widths: pad waste > 2x -> generic path
    assert dp.image_plan_for(64, 64) is None
    # non-8x8 blocks -> generic
    assert dp.image_plan_for(1536, 2048, block_dim=4) is None


def test_shared_rejects_bad_shapes():
    cfg = CodecConfig()
    with pytest.raises(ValueError):
        frame_stream.encode_frames_shared(np.zeros((4, 4), np.uint8), cfg)
