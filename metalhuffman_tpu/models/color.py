"""Multi-channel (color) image codec: planar channels over the video path.

The reference is strictly 8-bit grayscale (it converts its RGB assets through
CoreGraphics, ``HuffRenderFrame.m:93-127``). Color support here is planar:
each channel is a grayscale plane, and the planes ride the shared-table batch
pipeline (one canonical table + one kernel dispatch for all channels —
``frame_stream``). Works for RGB, RGBA, YCbCr or any (H, W, C) uint8 stack.
"""

from __future__ import annotations

import zlib

import numpy as np

from ..core import container
from .image_codec import CodecConfig
from . import frame_stream


def encode_color(img: np.ndarray, config: CodecConfig | None = None):
    """(H, W, C) uint8 -> (EncodedStream with shared table, C)."""
    img = np.asarray(img)
    if img.ndim != 3 or img.dtype != np.uint8:
        raise ValueError("expected (H, W, C) uint8")
    planes = np.moveaxis(img, -1, 0)  # (C, H, W)
    return frame_stream.encode_frames_shared(planes, config), img.shape[2]


def decode_color(
    stream: container.EncodedStream,
    height: int,
    width: int,
    channels: int,
    config: CodecConfig | None = None,
) -> np.ndarray:
    """Shared-table stream -> (H, W, C) uint8."""
    planes = np.asarray(
        frame_stream.decode_frames_shared(stream, channels, height, width, config)
    )
    return np.moveaxis(planes, 0, -1)


def encode_color_to_bytes(img: np.ndarray, config: CodecConfig | None = None) -> bytes:
    """(H, W, C) -> MHTV container (channels as frames, planes CRC recorded)."""
    stream, c = encode_color(img, config)
    h, w = img.shape[:2]
    planes = np.ascontiguousarray(np.moveaxis(np.asarray(img), -1, 0))
    return frame_stream.write_shared(
        stream, c, h, w, config, source_crc32=zlib.crc32(planes.tobytes()))


def decode_color_from_bytes(blob: bytes, config: CodecConfig | None = None) -> np.ndarray:
    """MHTV container -> (H, W, C); verifies the recorded planes CRC.

    The container's recorded block_dim/mode are authoritative (as in
    ``decode_video``); config chooses the backend only.
    """
    import dataclasses

    stream, c, h, w, bd, delta = frame_stream.read_shared(blob)
    cfg = dataclasses.replace(
        config or CodecConfig(), block_dim=bd, delta=delta,
        delta2d=stream.predictor == "2d")
    out = decode_color(stream, h, w, c, cfg)
    frame_stream.verify_source_crc32(
        np.ascontiguousarray(np.moveaxis(out, -1, 0)),
        frame_stream.source_crc32(blob))
    return out
