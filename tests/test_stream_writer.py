"""StreamingEncoder: push-frames MHV2 writer, byte-identical to batch.

The contract under test (stream_writer.py docstring): for the same frames,
config, and segment capacity, the streamed file equals the batch
``write_segmented(encode_frames_segmented(...))`` bytes exactly, no matter
how the frames were chunked across push() calls.
"""

import io
import zlib

import numpy as np
import pytest

from metalhuffman_tpu.models import CodecConfig, frame_stream
from metalhuffman_tpu.models.stream_writer import StreamingEncoder


def _frames(t, h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    out = []
    for i in range(t):
        img = 100 + 60 * np.sin((xx + 5 * i) / 17.0) * np.cos(yy / 13.0)
        out.append(np.clip(img + rng.normal(0, 2, (h, w)), 0,
                           255).astype(np.uint8))
    return np.stack(out)


def _batch_bytes(frames, cfg, max_segment_bits, frame_crcs=False):
    t, h, w = frames.shape
    segs = frame_stream.encode_frames_segmented(
        frames, cfg, max_segment_bits=max_segment_bits)
    crc = zlib.crc32(np.ascontiguousarray(frames).tobytes())
    fcrcs = frame_stream.compute_frame_crcs(frames) if frame_crcs else None
    return frame_stream.write_segmented(
        segs, h, w, cfg, source_crc32=crc, frame_crcs=fcrcs)


def _segment_bits_for(per, h, w, cfg):
    """max_segment_bits that yields exactly ``per`` frames per segment."""
    from metalhuffman_tpu.core import blocks

    bh, bw = blocks.block_grid(h, w, cfg.block_dim)
    fs = bh * bw * cfg.block_size
    return per * fs * frame_stream._SEG_BITS_PER_SYMBOL


@pytest.mark.parametrize("chunks", [[7], [1] * 7, [3, 1, 2, 1], [2, 5]])
@pytest.mark.parametrize(
    "cfg",
    [CodecConfig(), CodecConfig(delta=False),
     CodecConfig(delta2d=True), CodecConfig(zero_init=True)],
    ids=["delta", "plain", "delta2d", "zero_init"],
)
def test_byte_identical_to_batch(cfg, chunks):
    frames = _frames(7, 24, 40)
    bits = _segment_bits_for(3, 24, 40, cfg)  # -> segments of 3, 3, 1
    want = _batch_bytes(frames, cfg, bits)

    sink = io.BytesIO()
    enc = StreamingEncoder(sink, 24, 40, cfg, max_segment_bits=bits)
    start = 0
    for n in chunks:
        enc.push(frames[start : start + n])
        start += n
    stats = enc.close()
    assert sink.getvalue() == want
    assert stats.total_frames == 7
    assert stats.num_segments == 3
    assert stats.bytes_written == len(want)
    assert stats.source_crc32 == zlib.crc32(frames.tobytes())


def test_frame_crc_table_identical_and_readable():
    frames = _frames(5, 16, 16, seed=3)
    cfg = CodecConfig()
    bits = _segment_bits_for(2, 16, 16, cfg)
    want = _batch_bytes(frames, cfg, bits, frame_crcs=True)

    sink = io.BytesIO()
    with StreamingEncoder(sink, 16, 16, cfg, max_segment_bits=bits,
                          frame_crcs=True) as enc:
        for f in frames:
            enc.push(f)  # single (H, W) frame form
    data = sink.getvalue()
    assert data == want
    fcrcs = frame_stream.read_frame_crcs(data)
    np.testing.assert_array_equal(
        fcrcs, frame_stream.compute_frame_crcs(frames))


def test_max_segment_frames_matches_equivalent_batch():
    frames = _frames(6, 16, 16, seed=5)
    cfg = CodecConfig()
    # cap at 2 frames/segment; batch equivalent = bits for per=2
    want = _batch_bytes(frames, cfg, _segment_bits_for(2, 16, 16, cfg))
    sink = io.BytesIO()
    with StreamingEncoder(sink, 16, 16, cfg,
                          max_segment_frames=2) as enc:
        enc.push(frames)
    assert sink.getvalue() == want


def test_roundtrip_via_file_and_decode(tmp_path):
    frames = _frames(5, 24, 24, seed=9)
    cfg = CodecConfig(backend="native")
    path = tmp_path / "out.mhv2"
    with StreamingEncoder(path, 24, 24, cfg,
                          max_segment_frames=2) as enc:
        enc.push(frames[:4])
        enc.push(frames[4])
    data = path.read_bytes()
    segs, t, h, w, bd, delta = frame_stream.read_segmented(data)
    assert (t, h, w, len(segs)) == (5, 24, 24, 3)
    out = frame_stream.decode_frames_segmented(segs, h, w, cfg)
    np.testing.assert_array_equal(out, frames)
    assert frame_stream.source_crc32(data) == zlib.crc32(frames.tobytes())


def test_single_segment_is_one_segment_mhv2(tmp_path):
    # fits one segment: still a (valid, universally decodable) MHV2
    frames = _frames(3, 16, 16)
    cfg = CodecConfig(backend="native")
    path = tmp_path / "one.mhv2"
    with StreamingEncoder(path, 16, 16, cfg) as enc:
        enc.push(frames)
    segs, t, h, w, _, _ = frame_stream.read_segmented(path.read_bytes())
    assert len(segs) == 1 and t == 3
    out = frame_stream.decode_frames_segmented(segs, h, w, cfg)
    np.testing.assert_array_equal(out, frames)


def test_validation_errors():
    with pytest.raises(ValueError, match="temporal"):
        StreamingEncoder(io.BytesIO(), 16, 16, CodecConfig(temporal=True))
    with pytest.raises(ValueError, match="delta precoding"):
        StreamingEncoder(io.BytesIO(), 16, 16,
                         CodecConfig(delta=False, zero_init=True))
    with pytest.raises(ValueError, match="positive"):
        StreamingEncoder(io.BytesIO(), 0, 16)

    enc = StreamingEncoder(io.BytesIO(), 16, 16)
    with pytest.raises(ValueError, match="expected"):
        enc.push(np.zeros((8, 8), np.uint8))
    with pytest.raises(ValueError, match="uint8"):
        enc.push(np.zeros((16, 16), np.uint16))
    with pytest.raises(ValueError, match="empty"):
        enc.close()
    with pytest.raises(ValueError, match="after close"):
        enc.push(np.zeros((16, 16), np.uint8))
    # close() is idempotent once failed-closed? No: a failed close stays
    # closed; a *successful* close is idempotent:
    sink = io.BytesIO()
    enc2 = StreamingEncoder(sink, 16, 16)
    enc2.push(_frames(1, 16, 16))
    s1 = enc2.close()
    assert enc2.close() is s1


def test_non_seekable_sink_refused():
    class NoSeek(io.BytesIO):
        def seekable(self):
            return False

    with pytest.raises(ValueError, match="seekable"):
        StreamingEncoder(NoSeek(), 16, 16)


def test_abort_truncates(tmp_path):
    frames = _frames(4, 16, 16)
    path = tmp_path / "aborted.mhv2"
    try:
        with StreamingEncoder(path, 16, 16,
                              max_segment_frames=2) as enc:
            enc.push(frames)  # two full segments written
            raise RuntimeError("simulated producer failure")
    except RuntimeError:
        pass
    assert path.read_bytes() == b""  # no torn container left behind


def test_cli_streaming_encode_roundtrip(tmp_path):
    from metalhuffman_tpu import cli

    frames = _frames(9, 32, 48, seed=4)
    src = tmp_path / "f.npy"
    np.save(src, frames)
    out = tmp_path / "s.mhv2"
    dec = tmp_path / "d.npy"
    assert cli.main([
        "encode-video", str(src), str(out), "--streaming",
        "--segment-frames", "4", "--frame-crcs"]) == 0
    assert cli.main(["verify", str(out), "--backend", "native"]) == 0
    assert cli.main(["decode-video", str(out), str(dec),
                     "--backend", "native"]) == 0
    np.testing.assert_array_equal(np.load(dec), frames)
    # byte-identity with the library writer at the same capacity
    sink = io.BytesIO()
    with StreamingEncoder(sink, 32, 48, CodecConfig(),
                          max_segment_frames=4, frame_crcs=True) as enc:
        enc.push(frames)
    assert out.read_bytes() == sink.getvalue()


def test_cli_streaming_directory_input(tmp_path):
    from metalhuffman_tpu import cli
    from metalhuffman_tpu.utils import imageio

    frames = _frames(3, 16, 24, seed=8)
    d = tmp_path / "imgs"
    d.mkdir()
    for i, f in enumerate(frames):
        imageio.save_grayscale(f, d / f"frame_{i:03d}.png")
    out = tmp_path / "dir.mhv2"
    assert cli.main(["encode-video", str(d), str(out), "--streaming"]) == 0
    cfg = CodecConfig(backend="native")
    decoded, h, w = frame_stream.decode_range(out.read_bytes(), 0, 3, cfg)
    np.testing.assert_array_equal(decoded, frames)


def test_cli_streaming_refuses_whole_sequence_flags(tmp_path):
    from metalhuffman_tpu import cli

    src = tmp_path / "f.npy"
    np.save(src, _frames(2, 16, 16))
    out = tmp_path / "x.mhv2"
    for extra in (["--temporal"], ["--best"], ["--color"],
                  ["--per-frame-tables"]):
        with pytest.raises(SystemExit, match="streaming"):
            cli.main(["encode-video", str(src), str(out),
                      "--streaming", *extra])
    with pytest.raises(SystemExit, match="streaming"):
        cli.main(["encode-video", str(src), str(out),
                  "--segment-frames", "2"])


def test_streamed_file_serves_every_reader_surface(tmp_path):
    """info/verify/random access treat a streamed MHV2 like any other."""
    from metalhuffman_tpu import cli

    frames = _frames(5, 24, 24, seed=11)
    path = tmp_path / "s.mhv2"
    with StreamingEncoder(path, 24, 24, CodecConfig(),
                          max_segment_frames=2, frame_crcs=True) as enc:
        enc.push(frames)
    rc = cli.main(["info", str(path)])
    assert rc == 0
    # random access on the streamed container, straddling a segment boundary
    data = path.read_bytes()
    cfg = CodecConfig(backend="native")
    out, h, w = frame_stream.decode_range(data, 1, 4, cfg)
    np.testing.assert_array_equal(out, frames[1:4])
