"""Batched/sharded video decode + MHTS container."""

import numpy as np
import pytest

from metalhuffman_tpu.core import blocks
from metalhuffman_tpu.models import CodecConfig, frame_stream
from metalhuffman_tpu.parallel import mesh as mesh_mod


def _frames(t, h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    out = []
    for i in range(t):
        img = 100 + 60 * np.sin((xx + 5 * i) / 17.0) * np.cos(yy / 13.0)
        out.append(np.clip(img + rng.normal(0, 2, (h, w)), 0, 255).astype(np.uint8))
    return np.stack(out)


def test_batch_decode_matches_input():
    frames = _frames(5, 48, 64)
    cfg = CodecConfig(backend="xla")
    streams = frame_stream.encode_frames(frames, cfg)
    prep = frame_stream.prepare_batch(streams, 48, 64, cfg)
    out = np.asarray(frame_stream.decode_batch(prep, cfg))
    np.testing.assert_array_equal(out, frames)


def test_mhts_container_roundtrip():
    frames = _frames(3, 32, 40, seed=2)
    cfg = CodecConfig(backend="xla")
    streams = frame_stream.encode_frames(frames, cfg)
    blob = frame_stream.write_stream(streams, 32, 40, cfg)
    streams2, h, w, bd, delta = frame_stream.read_stream(blob)
    assert (h, w, bd, delta) == (32, 40, 8, True)
    assert len(streams2) == 3
    for a, b in zip(streams, streams2):
        np.testing.assert_array_equal(a.code_bytes, b.code_bytes)
        np.testing.assert_array_equal(a.block_offsets, b.block_offsets)
    prep = frame_stream.prepare_batch(streams2, h, w, cfg)
    out = np.asarray(frame_stream.decode_batch(prep, cfg))
    np.testing.assert_array_equal(out, frames)


def test_sharded_batch_decode():
    mesh = mesh_mod.make_mesh_2d(data_parallel=2)  # 2 x 4 on the CPU mesh
    frames = _frames(4, 40, 64, seed=3)
    cfg = CodecConfig(backend="xla")
    streams = frame_stream.encode_frames(frames, cfg)
    prep = frame_stream.prepare_batch(
        streams, 40, 64, cfg, pad_blocks_to=mesh.shape[mesh_mod.SEQ_AXIS]
    )
    out = np.asarray(frame_stream.decode_batch_sharded(prep, mesh, cfg))
    for i in range(4):
        blk = out[i, : prep.n_blocks]
        img = blocks.blocks_to_image(blk, 40, 64)
        np.testing.assert_array_equal(img, frames[i])


def test_empty_and_mismatched_streams_raise():
    with pytest.raises(ValueError):
        frame_stream.read_stream(b"MHTS" + b"\x00" * 4)
    frames = _frames(1, 16, 16)
    cfg = CodecConfig(backend="xla")
    s1 = frame_stream.encode_frames(frames, cfg)
    blob1 = frame_stream.write_stream(s1, 16, 16, cfg)
    blob2 = frame_stream.write_stream(s1, 24, 16, cfg)
    combined = b"MHTS" + (2).to_bytes(4, "little") + blob1[8:] + blob2[8:]
    with pytest.raises(ValueError):
        frame_stream.read_stream(combined)
