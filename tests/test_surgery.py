"""Lossless container surgery: extract / concat without re-encoding."""

import numpy as np
import pytest

import metalhuffman_tpu as mh
from metalhuffman_tpu.models import CodecConfig, frame_stream, surgery, temporal
from metalhuffman_tpu.models import color as color_mod

CPU = CodecConfig(backend="native")


def _frames(t=9, h=24, w=40, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h, w), np.uint8)
    return np.stack([np.roll(base, (2 * i, 3 * i), (0, 1)) for i in range(t)])


@pytest.mark.parametrize("frame_crcs", [False, True])
def test_extract_mhtv(frame_crcs):
    frames = _frames()
    cfg = CodecConfig(backend="native", frame_crcs=frame_crcs)
    blob = mh.encode_video(frames, cfg)
    for a, b in [(0, 9), (2, 7), (8, 9)]:
        out = surgery.extract_video(blob, a, b)
        got = mh.decode_video(out, CPU)
        np.testing.assert_array_equal(got, frames[a:b])
        if frame_crcs:
            # the combined whole-payload CRC must verify (it did: decode
            # checks it) and the sliced table must be present
            assert frame_stream.read_frame_crcs(out) is not None
            assert frame_stream.source_crc32(out) != 0
    with pytest.raises(ValueError):
        surgery.extract_video(blob, 5, 12)


def test_extract_mhv2_straddle_and_delta2d():
    frames = _frames(t=8)
    cfg = CodecConfig(backend="native", delta2d=True, frame_crcs=True)
    segs = frame_stream.encode_frames_segmented(frames, cfg,
                                                max_segment_bits=16_000)
    assert len(segs) > 1
    import zlib

    blob = frame_stream.write_segmented(
        segs, 24, 40, cfg,
        source_crc32=zlib.crc32(np.ascontiguousarray(frames).tobytes()),
        frame_crcs=np.array([zlib.crc32(f.tobytes()) for f in frames],
                            np.uint32))
    out = surgery.extract_video(blob, 1, 7)  # straddles segments
    got = mh.decode_video(out, CPU)
    np.testing.assert_array_equal(got, frames[1:7])


def test_extract_color_u16_temporal():
    rng = np.random.default_rng(1)
    # color
    cframes = np.stack([np.roll(rng.integers(0, 256, (16, 24, 3), np.uint8),
                                i, 0) for i in range(6)])
    cblob = color_mod.encode_color_video_to_bytes(
        cframes, CodecConfig(backend="native", frame_crcs=True),
        colorspace=color_mod.CS_SUBGREEN)
    out = surgery.extract_video(cblob, 2, 5)
    np.testing.assert_array_equal(
        color_mod.decode_color_video_from_bytes(out, CPU), cframes[2:5])
    # u16
    g16 = rng.integers(0, 1 << 16, (5, 16, 24)).astype(np.uint16)
    gblob = color_mod.encode_gray16_to_bytes(
        g16, CodecConfig(backend="native"))
    out16 = surgery.extract_video(gblob, 1, 4)
    np.testing.assert_array_equal(
        color_mod.decode_gray16_from_bytes(out16, CPU), g16[1:4])
    # temporal: keyint-aligned start required
    frames = _frames(t=10)
    tblob = mh.encode_video(frames, CodecConfig(
        backend="native", temporal=True, motion=True, keyint=4,
        frame_crcs=True))
    out_t = surgery.extract_video(tblob, 4, 9)
    np.testing.assert_array_equal(mh.decode_video(out_t, CPU), frames[4:9])
    with pytest.raises(ValueError, match="keyframe boundary"):
        surgery.extract_video(tblob, 3, 9)


def test_concat_roundtrip_and_crcs():
    a = _frames(t=4, seed=1)
    b = _frames(t=5, seed=2)
    c = _frames(t=3, seed=3)
    cfg = CodecConfig(backend="native", frame_crcs=True)
    spliced = surgery.concat_videos([mh.encode_video(x, cfg)
                                     for x in (a, b, c)])
    want = np.concatenate([a, b, c])
    got = mh.decode_video(spliced, CPU)  # verifies the COMBINED crc
    np.testing.assert_array_equal(got, want)
    assert frame_stream.source_crc32(spliced) != 0
    fc = frame_stream.read_frame_crcs(spliced)
    assert fc is not None and fc.shape == (12,)
    # range access on the splice (verifies sliced FCRC entries)
    got2, _h, _w = frame_stream.decode_range(spliced, 3, 10, CPU)
    np.testing.assert_array_equal(got2, want[3:10])
    # geometry mismatch refuses
    with pytest.raises(ValueError, match="mismatch"):
        surgery.concat_videos([mh.encode_video(a, cfg),
                               mh.encode_video(_frames(h=16), cfg)])


def test_concat_temporal():
    a = _frames(t=8, seed=4)   # whole keyframe groups (keyint 4)
    b = _frames(t=6, seed=5)
    cfg = CodecConfig(backend="native", temporal=True, keyint=4,
                      frame_crcs=True)
    spliced = surgery.concat_videos([mh.encode_video(a, cfg),
                                     mh.encode_video(b, cfg)])
    np.testing.assert_array_equal(
        mh.decode_video(spliced, CPU), np.concatenate([a, b]))
    # misaligned first input refuses
    bad = mh.encode_video(_frames(t=7, seed=6), cfg)
    with pytest.raises(ValueError, match="keyframe groups"):
        surgery.concat_videos([bad, mh.encode_video(b, cfg)])


def test_extract_equals_reencode_payload():
    # the extracted container's decoded output must equal a re-encode's —
    # but WITHOUT having touched the symbols (trim+rebase only)
    frames = _frames(t=6)
    blob = mh.encode_video(frames, CPU)
    out = surgery.extract_video(blob, 2, 5)
    assert out[:4] == frame_stream.SHARED_MAGIC
    stream, t, h, w, bd, delta = frame_stream.read_shared(out)
    assert t == 3 and (h, w) == (24, 40)
    # offsets were rebased to start within the first byte
    assert int(stream.block_offsets[0]) < 8
    np.testing.assert_array_equal(mh.decode_video(out, CPU), frames[2:5])


def test_cli_extract_concat(tmp_path):
    from metalhuffman_tpu.cli import main

    frames = _frames(t=6)
    src = tmp_path / "v.npy"
    np.save(src, frames)
    full = tmp_path / "v.mhtv"
    main(["encode-video", str(src), str(full), "--frame-crcs",
          "--backend", "native"])
    part = tmp_path / "part.mhtv"
    main(["extract", str(full), str(part), "--frames", "1", "4"])
    got = tmp_path / "got.npy"
    main(["decode-video", str(part), str(got), "--backend", "native"])
    np.testing.assert_array_equal(np.load(got), frames[1:4])
    joined = tmp_path / "joined.mhv2"
    main(["concat", str(joined), str(part), str(full)])
    main(["decode-video", str(joined), str(got), "--backend", "native"])
    np.testing.assert_array_equal(
        np.load(got), np.concatenate([frames[1:4], frames]))
    # verify passes on surgical outputs (all integrity metadata intact)
    main(["verify", str(joined), "--backend", "native"])


def test_extract_zero_init_and_no_delta():
    frames = _frames(t=6)
    # zero-init (mode 2): block_init root bytes must slice with the blocks
    zi = mh.encode_video(frames, CodecConfig(backend="native",
                                             zero_init=True))
    out = surgery.extract_video(zi, 1, 5)
    np.testing.assert_array_equal(mh.decode_video(out, CPU), frames[1:5])
    stream, _t, _h, _w, _bd, _d = frame_stream.read_shared(out)
    assert stream.block_init is not None
    # no-delta (mode 0)
    nd = mh.encode_video(frames, CodecConfig(backend="native", delta=False))
    out2 = surgery.extract_video(nd, 2, 6)
    np.testing.assert_array_equal(mh.decode_video(out2, CPU), frames[2:6])
    # extracted containers decode through the device path too
    np.testing.assert_array_equal(
        mh.decode_video(out, CodecConfig()), frames[1:5])


def test_concat_zero_init_and_mixed_mode_refused():
    frames_a = _frames(t=3, seed=7)
    frames_b = _frames(t=4, seed=8)
    zi = CodecConfig(backend="native", zero_init=True)
    spliced = surgery.concat_videos([mh.encode_video(frames_a, zi),
                                     mh.encode_video(frames_b, zi)])
    np.testing.assert_array_equal(
        mh.decode_video(spliced, CPU), np.concatenate([frames_a, frames_b]))
    # mixing precoder modes must refuse (write_segmented's mode gate)
    plain = mh.encode_video(frames_b, CPU)
    with pytest.raises(ValueError):
        surgery.concat_videos([mh.encode_video(frames_a, zi), plain])
