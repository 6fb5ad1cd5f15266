"""Grayscale image file IO.

The reference converts PNGs to 8-bit grayscale through CoreGraphics
(``HuffRenderFrame.m:67-127``) and carries a vestigial TGA parser
(``AAPLImage.m:14-160``). Here: PIL-based load/save when available, plus a
dependency-free raw ``.gray`` format and a minimal TGA reader (8-bit
grayscale / 24-bit BGR) for parity with the reference's loader.
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np


def load_grayscale(path: str | Path) -> np.ndarray:
    """Load any PIL-supported image as (H, W) uint8 grayscale (BT.601 luma,
    matching the reference's CoreGraphics gray conversion)."""
    path = Path(path)
    if path.suffix == ".gray":
        return load_raw_gray(path)
    if path.suffix.lower() == ".tga":
        return tga_to_grayscale(load_tga(path))
    from PIL import Image

    return np.asarray(Image.open(path).convert("L"))


def save_grayscale(img: np.ndarray, path: str | Path) -> None:
    path = Path(path)
    img = np.asarray(img, dtype=np.uint8)
    if path.suffix == ".gray":
        save_raw_gray(img, path)
        return
    from PIL import Image

    Image.fromarray(img, mode="L").save(path)


# -- raw .gray: trivial dependency-free container -----------------------------

_GRAY_MAGIC = b"GRY1"


def save_raw_gray(img: np.ndarray, path: str | Path) -> None:
    h, w = img.shape
    Path(path).write_bytes(
        _GRAY_MAGIC + struct.pack("<II", h, w) + np.ascontiguousarray(img).tobytes()
    )


def load_raw_gray(path: str | Path) -> np.ndarray:
    data = Path(path).read_bytes()
    if data[:4] != _GRAY_MAGIC:
        raise ValueError("not a GRY1 file")
    h, w = struct.unpack_from("<II", data, 4)
    return np.frombuffer(data, np.uint8, h * w, 12).reshape(h, w).copy()


# -- minimal TGA reader (reference: AAPLImage.m:14-160) -----------------------


def load_tga(path: str | Path) -> np.ndarray:
    """Read an uncompressed TGA: returns (H, W) uint8 gray or (H, W, 3) BGR."""
    data = Path(path).read_bytes()
    if len(data) < 18:
        raise ValueError("truncated TGA header")
    id_len = data[0]
    cmap_type = data[1]
    img_type = data[2]
    w, h = struct.unpack_from("<HH", data, 12)
    bpp = data[16]
    descriptor = data[17]
    if cmap_type != 0:
        raise ValueError("color-mapped TGA not supported")
    if img_type not in (2, 3):
        raise ValueError(f"unsupported TGA image type {img_type} (no RLE)")
    off = 18 + id_len
    if bpp == 8:
        img = np.frombuffer(data, np.uint8, h * w, off).reshape(h, w).copy()
    elif bpp in (24, 32):
        c = bpp // 8
        img = np.frombuffer(data, np.uint8, h * w * c, off).reshape(h, w, c)[..., :3].copy()
    else:
        raise ValueError(f"unsupported TGA depth {bpp}")
    if not (descriptor & 0x20):  # origin at bottom-left -> flip vertically
        img = img[::-1].copy()
    return img


def tga_to_grayscale(img: np.ndarray) -> np.ndarray:
    if img.ndim == 2:
        return img
    b, g, r = img[..., 0].astype(np.float64), img[..., 1].astype(np.float64), img[..., 2].astype(np.float64)
    return np.clip(0.299 * r + 0.587 * g + 0.114 * b, 0, 255).astype(np.uint8)
