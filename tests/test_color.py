"""Planar color codec over the shared-table pipeline."""

import numpy as np
import pytest

from metalhuffman_tpu.models import CodecConfig, color


def _rgb(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    r = np.clip(120 + 80 * np.sin(xx / 11.0), 0, 255)
    g = np.clip(100 + 80 * np.cos(yy / 13.0), 0, 255)
    b = np.clip(90 + rng.normal(0, 10, (h, w)), 0, 255)
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


@pytest.mark.parametrize("channels", [3, 4])
def test_color_roundtrip(channels):
    img = _rgb(32, 48)[:, :, :3]
    if channels == 4:
        img = np.concatenate([img, np.full((32, 48, 1), 255, np.uint8)], axis=-1)
    cfg = CodecConfig(backend="pallas", interpret=True)
    blob = color.encode_color_to_bytes(img, cfg)
    out = color.decode_color_from_bytes(blob, cfg)
    np.testing.assert_array_equal(out, img)


def test_color_rejects_bad_input():
    with pytest.raises(ValueError):
        color.encode_color(np.zeros((8, 8), np.uint8))
    with pytest.raises(ValueError):
        color.encode_color(np.zeros((8, 8, 3), np.float32))
