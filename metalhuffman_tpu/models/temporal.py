"""Temporal (inter-frame) prediction for video: the MHVT wrapper container.

Every other video container codes each frame independently, but real video
is temporally redundant — consecutive frames differ in a few pixels. This
module adds the missing prediction axis: frame ``t`` is stored as its
byte-wise difference from frame ``t-1`` (mod 256/65536), with a literal
KEYFRAME every ``keyint`` frames so temporal random access stays bounded
(decoding frame ``n`` touches at most ``keyint`` residual frames — the
video-codec I-frame/P-frame structure, reduced to its lossless byte form).

The reference has no temporal model at all — its "video" story is decoding
the same still frame at 30 FPS (``AAPLRenderer.m:1178-1924``); this is a
beyond-reference capability like delta2d and the MHTC color planes.

Why a wrapper and not a new stream mode: the residual frames are ordinary
byte frames, so they ride the ENTIRE existing stack unchanged — shared-table
MHTV/MHV2 streams, the Pallas decode kernel, spatial precoders (delta /
delta2d compose with temporal residuals and ``--best`` measures them on the
actual residual payload), MHTC color/16-bit planes, segmenting, integrity
checks. On disk::

    "MHVT" | u16 keyint | u16 flags | u32 inner_len
           | [flags bit 0: u32 T + T x (i16 dy, i16 dx) motion table]
           | [flags bit 1: u32 T + T x u32 per-TRUE-frame CRC-32 table]
           | inner video container (MHTV / MHV2 / MHTC video)
           | u32 source_crc32 of the TRUE frames (0 = unrecorded)

Flags bit 0 marks global motion compensation (circular-shift predictors,
see below); bit 1 marks a per-frame CRC table that lets RANDOM ACCESS
(``decode_temporal_frame`` / ``decode_temporal_range``) verify exactly the
frames it reconstructs — the whole-payload CRCs cannot cover a slice.

The inner container's own CRC covers the residual payload (stream
integrity); the outer CRC additionally pins the reconstruction parameters
(a corrupted ``keyint`` would reconstruct wrong frames from valid
residuals).

Reconstruction is a per-group cumulative byte sum — mod-2^8/2^16 addition is
associative, so it vectorizes (``np.cumsum`` with a wrapping accumulator
dtype on the host, group-reshaped ``jnp.cumsum`` on device) and never
re-serializes the block-parallel Huffman decode.
"""

from __future__ import annotations

import dataclasses
import struct
import zlib

import numpy as np

from .image_codec import CodecConfig

TEMPORAL_MAGIC = b"MHVT"

_HEADER = "<HHI"  # keyint, flags, inner_len
_HEADER_SIZE = 4 + struct.calcsize(_HEADER)

FLAG_MOTION = 1  #: header flag: per-frame global motion vectors present


# -- the transform (container-independent) ------------------------------------


def temporal_encode(frames: np.ndarray, keyint: int = 8) -> np.ndarray:
    """(T, ...) unsigned frames -> residuals: keyframes literal, the rest
    byte-wise ``frame[t] - frame[t-1]`` (wrapping mod 2^bits).

    Works on any unsigned integer stack — (T, H, W) u8 grayscale,
    (T, H, W, C) u8 color, (T, H, W) u16 — because wrapping subtraction is
    exactly invertible per element regardless of layout.
    """
    frames = np.asarray(frames)
    if frames.ndim < 3:
        raise ValueError("frames must be (T, H, W[, C])")
    if frames.dtype not in (np.uint8, np.uint16):
        raise ValueError("temporal prediction needs uint8/uint16 frames")
    if keyint < 1:
        raise ValueError("keyint must be >= 1")
    res = frames.copy()
    res[1:] -= frames[:-1]  # unsigned wraparound IS the mod-2^bits residual
    res[keyint::keyint] = frames[keyint::keyint]  # literal keyframes
    return res


def temporal_decode(residuals: np.ndarray, keyint: int = 8) -> np.ndarray:
    """Inverse of :func:`temporal_encode`: per-group cumulative wrapping sum.

    Accumulated frame-by-frame with vectorized wrapping adds — NOT
    ``np.cumsum``, whose uint8 accumulator path is ~10x slower (0.09 vs up
    to 2 GB/s measured on a 94 MB batch; in-place ``np.add(out=)`` into the
    destination views also measured several times slower than fresh temps).
    """
    residuals = np.asarray(residuals)
    if keyint < 1:
        raise ValueError("keyint must be >= 1")
    out = np.empty_like(residuals)
    for i in range(residuals.shape[0]):
        out[i] = (out[i - 1] + residuals[i]) if i % keyint else residuals[i]
    return out


def temporal_decode_jax(residuals, keyint: int = 8):
    """Device-resident reconstruction: group-reshaped ``jnp.cumsum``.

    Pads T to a keyint multiple, scans each (G, keyint, ...) group along the
    group axis in the wrapping dtype, and crops. Keeps the fold on-chip for
    consumers that hold decoded residual batches as device arrays (the host
    path in :func:`temporal_decode` is the default for container decode).
    """
    import jax.numpy as jnp

    if keyint < 1:
        raise ValueError("keyint must be >= 1")
    t = residuals.shape[0]
    pad = (-t) % keyint
    x = jnp.pad(residuals, [(0, pad)] + [(0, 0)] * (residuals.ndim - 1))
    grp = x.reshape((x.shape[0] // keyint, keyint) + x.shape[1:])
    out = jnp.cumsum(grp, axis=1, dtype=residuals.dtype)
    return out.reshape((-1,) + x.shape[1:])[:t]


# -- global motion compensation ------------------------------------------------
#
# A lossless byte codec cannot cancel global motion (panning) with plain
# frame differencing: every pixel changes by the local spatial gradient and
# the residuals get NOISIER than the frames (PERF.md temporal study,
# x1.09). The fix is one integer motion vector per frame: the predictor
# becomes a CIRCULAR shift of the previous frame — np.roll is exactly
# invertible, so losslessness is free and only the wrapped border rows/
# columns mispredict (~(|dy|*W + |dx|*H) pixels per frame).


def _luma(frame: np.ndarray) -> np.ndarray:
    """Estimation field: float32 luma (channel mean for color stacks)."""
    f = frame.astype(np.float32)
    return f.mean(axis=-1) if f.ndim == 3 else f


def _mc_cost(prev: np.ndarray, cur: np.ndarray, mv: tuple, step: int = 4) -> int:
    """Wrapping-residual magnitude of predictor roll(prev, mv), subsampled."""
    pred = np.roll(prev, mv, axis=(0, 1)) if mv != (0, 0) else prev
    m = 65536 if prev.dtype == np.uint16 else 256
    r = (cur[::step, ::step].astype(np.int32)
         - pred[::step, ::step].astype(np.int32)) % m
    return int(np.minimum(r, m - r).sum())


def estimate_motion(prev: np.ndarray, cur: np.ndarray,
                    max_shift: int = 256) -> tuple[int, int]:
    """Integer global motion (dy, dx) with ``cur ~= roll(prev, (dy, dx))``.

    Phase correlation (normalized cross-power spectrum peak) on the luma
    field — one shot, no search loop, handles arbitrary shifts up to half
    the frame. The candidate is accepted only when it actually beats zero
    motion on the wrapping-residual cost the encoder will pay, so hostile
    content degrades to plain temporal differencing, never below it.
    """
    a, b = _luma(prev), _luma(cur)
    fa = np.fft.rfft2(a)
    fb = np.fft.rfft2(b)
    cross = fb * np.conj(fa)
    cross /= np.abs(cross) + 1e-6
    corr = np.fft.irfft2(cross, a.shape)
    peak = np.unravel_index(int(np.argmax(corr)), corr.shape)
    dy = peak[0] - (a.shape[0] if peak[0] > a.shape[0] // 2 else 0)
    dx = peak[1] - (a.shape[1] if peak[1] > a.shape[1] // 2 else 0)
    if abs(dy) > max_shift or abs(dx) > max_shift or (dy, dx) == (0, 0):
        return (0, 0)
    if _mc_cost(prev, cur, (int(dy), int(dx))) < _mc_cost(prev, cur, (0, 0)):
        return (int(dy), int(dx))
    return (0, 0)


def temporal_encode_mc(frames: np.ndarray, keyint: int = 8,
                       mvs: np.ndarray | None = None):
    """Motion-compensated residuals: ``frame[t] - roll(frame[t-1], mv[t])``.

    Returns ``(residuals, mvs)`` with ``mvs`` a (T, 2) int16 array of
    per-frame (dy, dx) — estimated per non-key frame when not supplied;
    keyframes are literal and carry (0, 0).
    """
    frames = np.asarray(frames)
    if frames.ndim < 3:
        raise ValueError("frames must be (T, H, W[, C])")
    if frames.dtype not in (np.uint8, np.uint16):
        raise ValueError("temporal prediction needs uint8/uint16 frames")
    if keyint < 1:
        raise ValueError("keyint must be >= 1")
    t = frames.shape[0]
    if mvs is None:
        mvs = np.zeros((t, 2), np.int16)
        for i in range(1, t):
            if i % keyint:
                mvs[i] = estimate_motion(frames[i - 1], frames[i])
    else:
        mvs = np.asarray(mvs, np.int16).reshape(t, 2)
    res = frames.copy()
    for i in range(1, t):
        if i % keyint == 0:
            continue  # literal keyframe
        mv = (int(mvs[i, 0]), int(mvs[i, 1]))
        pred = (np.roll(frames[i - 1], mv, axis=(0, 1)) if mv != (0, 0)
                else frames[i - 1])
        res[i] = frames[i] - pred  # unsigned wraparound
    return res, mvs


def temporal_decode_mc(residuals: np.ndarray, keyint: int,
                       mvs: np.ndarray) -> np.ndarray:
    """Inverse of :func:`temporal_encode_mc` (sequential within a group —
    each frame's predictor is the previous RECONSTRUCTED frame, rolled)."""
    residuals = np.asarray(residuals)
    mvs = np.asarray(mvs)
    if mvs.ndim != 2 or mvs.shape != (residuals.shape[0], 2):
        # validated here so EVERY fold site (library, CLI decode-video,
        # CLI verify) turns a truncated/corrupt motion table into the same
        # clean error instead of a raw IndexError
        raise ValueError(
            "corrupt MHVT container (motion table length disagrees with "
            "the frame count)")
    out = np.empty_like(residuals)
    for i in range(residuals.shape[0]):
        if i % keyint == 0:
            out[i] = residuals[i]
            continue
        mv = (int(mvs[i, 0]), int(mvs[i, 1]))
        pred = (np.roll(out[i - 1], mv, axis=(0, 1)) if mv != (0, 0)
                else out[i - 1])
        out[i] = residuals[i] + pred
    return out


# -- container ------------------------------------------------------------------


def wrap(inner: bytes, keyint: int, source_crc32: int = 0,
         mvs: np.ndarray | None = None) -> bytes:
    """Wrap an inner video container blob in the MHVT header + CRC trailer.

    With ``mvs`` (a (T, 2) int16 array of per-frame global motion vectors)
    the header flags bit 0 is set and ``u32 T`` + T x (i16 dy, i16 dx)
    follow the header before the inner blob.
    """
    if not 1 <= keyint <= 0xFFFF:
        raise ValueError("keyint must be in 1..65535")
    if len(inner) > 0xFFFFFFFF:
        raise ValueError(
            "inner container exceeds the MHVT u32 length field (4 GiB of "
            "compressed residuals); split the sequence into multiple MHVT "
            "containers (e.g. encode in chunks of whole keyframe groups)")
    flags = 0
    mv_blob = b""
    if mvs is not None:
        mvs = np.asarray(mvs, np.int16).reshape(-1, 2)
        flags |= FLAG_MOTION
        mv_blob = struct.pack("<I", mvs.shape[0]) + mvs.astype("<i2").tobytes()
    return (TEMPORAL_MAGIC + struct.pack(_HEADER, keyint, flags, len(inner))
            + mv_blob + inner + struct.pack("<I", source_crc32 & 0xFFFFFFFF))


def unwrap(blob: bytes):
    """MHVT blob -> (inner_bytes, keyint, source_crc32, mvs_or_None)."""
    if blob[:4] != TEMPORAL_MAGIC:
        raise ValueError("not an MHVT container")
    if len(blob) < _HEADER_SIZE:
        raise ValueError("truncated MHVT container (header incomplete)")
    keyint, flags, inner_len = struct.unpack_from(_HEADER, blob, 4)
    if keyint < 1:
        raise ValueError("corrupt MHVT container (keyint 0)")
    pos = _HEADER_SIZE
    mvs = None
    if flags & FLAG_MOTION:
        if len(blob) < pos + 4:
            raise ValueError("truncated MHVT container (motion table)")
        (t,) = struct.unpack_from("<I", blob, pos)
        pos += 4
        if len(blob) < pos + 4 * t:
            raise ValueError("truncated MHVT container (motion table)")
        mvs = np.frombuffer(blob, dtype="<i2", count=2 * t,
                            offset=pos).reshape(t, 2).copy()
        pos += 4 * t
    end = pos + inner_len
    if len(blob) < end + 4:
        raise ValueError("truncated MHVT container (inner/trailer missing)")
    (crc,) = struct.unpack_from("<I", blob, end)
    return blob[pos:end], keyint, crc, mvs


def _inner_config(config: CodecConfig | None) -> CodecConfig:
    """The config the inner (residual) encode/decode runs under."""
    return dataclasses.replace(config or CodecConfig(), temporal=False,
                               motion=False)


def _crc(frames: np.ndarray) -> int:
    return zlib.crc32(np.ascontiguousarray(frames).tobytes()) & 0xFFFFFFFF


def _residuals(frames: np.ndarray, cfg: CodecConfig,
               mvs: np.ndarray | None = None):
    """(residual stack, mvs-or-None) per the config's motion flag.

    ``mvs`` (when given and ``cfg.motion``) supplies precomputed per-frame
    motion vectors so a caller that already estimated them — e.g. the
    ``--best`` search measuring precoders on the true MC payload — never
    pays (or risks diverging from) a second estimation pass.
    """
    if cfg.motion:
        return temporal_encode_mc(frames, cfg.keyint, mvs)
    return temporal_encode(frames, cfg.keyint), None


def encode_temporal_video(frames: np.ndarray,
                          config: CodecConfig | None = None,
                          mvs: np.ndarray | None = None) -> bytes:
    """(T, H, W) uint8 -> MHVT wrapping an MHTV/MHV2 residual stream.

    With ``config.motion`` each non-key frame's predictor is the previous
    frame circularly shifted by an estimated global motion vector
    (stored in the wrapper); pass ``mvs`` to reuse vectors estimated by an
    earlier search pass."""
    from .. import encode_video

    cfg = config or CodecConfig()
    frames = np.asarray(frames)
    res, mvs = _residuals(frames, cfg, mvs)
    return wrap(encode_video(res, _inner_config(cfg)), cfg.keyint,
                source_crc32=_crc(frames), mvs=mvs)


def encode_temporal_color_video(frames: np.ndarray,
                                config: CodecConfig | None = None,
                                colorspace: int | None = None,
                                mvs: np.ndarray | None = None) -> bytes:
    """(T, H, W, C) uint8 -> MHVT wrapping an MHTC residual video."""
    from . import color

    cfg = config or CodecConfig()
    frames = np.asarray(frames)
    res, mvs = _residuals(frames, cfg, mvs)
    cs = color.CS_IDENTITY if colorspace is None else colorspace
    inner = color.encode_color_video_to_bytes(res, _inner_config(cfg),
                                              colorspace=cs)
    return wrap(inner, cfg.keyint, source_crc32=_crc(frames), mvs=mvs)


def encode_temporal_gray16_video(frames: np.ndarray,
                                 config: CodecConfig | None = None,
                                 mvs: np.ndarray | None = None) -> bytes:
    """(T, H, W) uint16 -> MHVT wrapping an MHTC kind=1 residual video.

    The residual is computed mod 65536 on the u16 frames (NOT per byte
    plane), so a small depth change never rolls the hi plane unpredictably.
    """
    from . import color

    cfg = config or CodecConfig()
    frames = np.asarray(frames)
    if frames.ndim != 3 or frames.dtype != np.uint16:
        raise ValueError("expected (T, H, W) uint16")
    res, mvs = _residuals(frames, cfg, mvs)
    inner = color.encode_gray16_to_bytes(res, _inner_config(cfg))
    return wrap(inner, cfg.keyint, source_crc32=_crc(frames), mvs=mvs)


def _decode_inner(inner: bytes, config: CodecConfig | None) -> np.ndarray:
    """Decode any inner video container to its (T, ...) residual stack."""
    from .. import decode_video
    from . import color

    cfg = _inner_config(config)
    if inner[:4] == color.COLOR_MAGIC:
        _, _ch, layout, kind, _cs = color.unwrap(inner)
        if layout != color.LAYOUT_VIDEO:
            raise ValueError("MHVT inner MHTC container is not a video")
        if kind == color.KIND_U16:
            return color.decode_gray16_from_bytes(inner, cfg)
        return color.decode_color_video_from_bytes(inner, cfg)
    return decode_video(inner, cfg)


def decode_temporal_video(blob: bytes,
                          config: CodecConfig | None = None) -> np.ndarray:
    """MHVT container -> reconstructed frames (shape/dtype per inner kind:
    (T, H, W) u8, (T, H, W, C) u8, or (T, H, W) u16), CRC-verified twice
    (inner residual CRC, then the outer true-frame CRC)."""
    inner, keyint, crc, mvs = unwrap(blob)
    res = _decode_inner(inner, config)
    if mvs is not None:
        frames = temporal_decode_mc(res, keyint, mvs)  # validates the table
    else:
        frames = temporal_decode(res, keyint)
    if crc and _crc(frames) != crc:
        raise ValueError(
            "reconstructed frames fail the MHVT source CRC-32 — corrupt "
            "container (the inner residual stream verified, so the wrapper "
            "header itself is suspect)")
    return frames


def decode_temporal_frame(blob: bytes, n: int,
                          config: CodecConfig | None = None) -> np.ndarray:
    """Random access: reconstruct frame ``n`` of an MHVT container.

    Decodes only the residual frames from the preceding keyframe through
    ``n`` — at most ``keyint`` frames' blocks (the per-block offset index
    gives the frame slices; ``frame_stream.decode_range``) — and folds them
    with one wrapping sum. No CRC check (the recorded CRCs cover whole
    payloads), matching every other ``--frame`` access path.
    """
    from . import color, frame_stream

    inner, keyint, _crc_, mvs = unwrap(blob)
    if n < 0:
        raise ValueError(f"frame {n} out of range")
    kf = (n // keyint) * keyint
    cfg = _inner_config(config)
    if inner[:4] == color.COLOR_MAGIC:
        inner2, channels, layout, kind, cs = color.unwrap(inner)
        if layout != color.LAYOUT_VIDEO:
            raise ValueError("MHVT inner MHTC container is not a video")
        planes, _h, _w = frame_stream.decode_range(
            inner2, kf * channels, (n + 1) * channels, cfg)
        res = color.fold_video_planes(planes, channels, kind, cs)
    else:
        res, h, w = frame_stream.decode_range(inner, kf, n + 1, cfg)
        res = res.reshape(-1, h, w)
    if mvs is None:
        # one wrapping reduction: keyframe + residuals -> frame n
        return np.add.reduce(res, axis=0, dtype=res.dtype)
    if mvs.shape[0] <= n:
        raise ValueError(
            "corrupt MHVT container (motion table shorter than the stream)")
    out = res[0]
    for i in range(1, res.shape[0]):
        mv = (int(mvs[kf + i, 0]), int(mvs[kf + i, 1]))
        pred = np.roll(out, mv, axis=(0, 1)) if mv != (0, 0) else out
        out = res[i] + pred
    return out


def _best_precoder(frames: np.ndarray, cfg: CodecConfig) -> CodecConfig:
    """Smallest of none/delta/delta2d measured on the actual payload."""
    from . import frame_stream

    candidates = [
        dataclasses.replace(cfg, delta=False, delta2d=False, zero_init=False),
        dataclasses.replace(cfg, delta=True, delta2d=False),
        dataclasses.replace(cfg, delta=True, delta2d=True),
    ]

    def total(c):
        return sum(s.compressed_size
                   for s, _ in frame_stream.encode_frames_segmented(frames, c))

    return min(candidates, key=total)


def encode_video_best(frames: np.ndarray, config: CodecConfig | None = None):
    """Measure the coding modes — each with its best spatial precoder on
    its own payload — and keep the smallest container.

    Candidates: plain, temporal, and (with ``config.motion``) temporal with
    global motion compensation. Temporal prediction is content-dependent
    the same way sub-green is (PERF.md): a static camera with local motion
    shrinks 2-3x, but global motion (panning) makes plain frame residuals
    NOISIER than the frames themselves — the MC candidate cancels exactly
    that case with per-frame circular-shift predictors. Measuring is the
    only safe policy. Returns ``(blob, kind, used_config)`` with ``kind``
    one of ``"plain" | "temporal" | "temporal+motion"``.
    """
    from .. import encode_video

    cfg = config or CodecConfig()
    frames = np.asarray(frames)
    candidates = []
    cfg_p = _best_precoder(frames, _inner_config(cfg))
    candidates.append((encode_video(frames, cfg_p), "plain", cfg_p))
    plain_cfg = dataclasses.replace(cfg, motion=False)
    cfg_t = _best_precoder(temporal_encode(frames, cfg.keyint), plain_cfg)
    candidates.append(
        (encode_temporal_video(frames, cfg_t), "temporal", cfg_t))
    if cfg.motion:
        res_mc, mvs = temporal_encode_mc(frames, cfg.keyint)
        cfg_m = _best_precoder(res_mc, cfg)
        blob_m = wrap(encode_video(res_mc, _inner_config(cfg_m)), cfg.keyint,
                      source_crc32=_crc(frames), mvs=mvs)
        candidates.append((blob_m, "temporal+motion", cfg_m))
    return min(candidates, key=lambda c: len(c[0]))


def decode_temporal_range(blob: bytes, a: int, b: int,
                          config: CodecConfig | None = None) -> np.ndarray:
    """Reconstruct frames [a, b) of an MHVT container (range analog of
    ``frame_stream.decode_range``).

    Decodes residual frames from the keyframe preceding ``a`` through
    ``b-1`` — at most ``keyint - 1`` extra frames of work — folds the
    whole span once, and returns the requested slice.
    """
    from . import color, frame_stream

    if not 0 <= a < b:
        raise ValueError(f"invalid frame range [{a}, {b})")
    inner, keyint, _crc_, mvs = unwrap(blob)
    kf = (a // keyint) * keyint
    cfg = _inner_config(config)
    if inner[:4] == color.COLOR_MAGIC:
        inner2, channels, layout, kind, cs = color.unwrap(inner)
        if layout != color.LAYOUT_VIDEO:
            raise ValueError("MHVT inner MHTC container is not a video")
        planes, _h, _w = frame_stream.decode_range(
            inner2, kf * channels, b * channels, cfg)
        res = color.fold_video_planes(planes, channels, kind, cs)
    else:
        res, h, w = frame_stream.decode_range(inner, kf, b, cfg)
        res = res.reshape(-1, h, w)
    if mvs is not None:
        if mvs.shape[0] < b:
            raise ValueError(
                "corrupt MHVT container (motion table shorter than the "
                "stream)")
        out = temporal_decode_mc(res, keyint, mvs[kf:b])
    else:
        # the span starts at a keyframe, so the plain group fold applies
        out = temporal_decode(res, keyint)
    return out[a - kf :]


def describe(blob: bytes) -> str:
    """One-line human description of the MHVT wrapper (for CLI ``info``)."""
    _, keyint, crc, mvs = unwrap(blob)
    motion = ""
    if mvs is not None:
        moving = int((mvs != 0).any(axis=1).sum())
        motion = f", motion-compensated ({moving}/{mvs.shape[0]} frames move)"
    return (f"MHVT: temporal prediction, keyframe every {keyint}{motion}, "
            f"crc32={'recorded' if crc else 'absent'}")
