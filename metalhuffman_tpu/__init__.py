"""metalhuffman-tpu: a TPU-native canonical Huffman codec framework.

Built from scratch with the capabilities of mdejong/MetalHuffman (GPU Huffman
decode demo for Metal), redesigned TPU-first:

- ``core``: CPU codec core (canonical codes, bitstream, LUTs, delta, container).
- ``native``: C++ fast-path codec library with ctypes bindings.
- ``ops``: device decode paths — vectorized XLA decode and the Pallas TPU kernel.
- ``parallel``: mesh/sharding utilities for multi-chip / multi-host decode.
- ``models``: end-to-end codec pipelines (grayscale image codec, frame streams).
- ``utils``: fixtures (test frames), PNG/TGA IO, profiling helpers.
"""

__version__ = "0.1.0"


def encode_image(img, config=None) -> bytes:
    """Convenience: (H, W) uint8 grayscale image -> MHT1 container bytes."""
    from .models import ImageCodec

    return ImageCodec(config).encode_to_bytes(img)


def decode_image(blob: bytes, config=None):
    """Convenience: MHT1 container bytes -> (H, W) uint8 image (CRC-checked)."""
    from .models import ImageCodec

    return ImageCodec(config).decode(blob)


def encode_video(frames, config=None) -> bytes:
    """Convenience: (T, H, W) uint8 frames -> MHTV shared-table container."""
    from .models import frame_stream

    frames_arr = __import__("numpy").asarray(frames)
    t, h, w = frames_arr.shape
    stream = frame_stream.encode_frames_shared(frames_arr, config)
    return frame_stream.write_shared(stream, t, h, w, config)


def decode_video(blob: bytes, config=None):
    """Convenience: MHTV container bytes -> (T, H, W) uint8 frames."""
    import numpy as np

    from .models import frame_stream

    stream, t, h, w, _bd, _delta = frame_stream.read_shared(blob)
    return np.asarray(frame_stream.decode_frames_shared(stream, t, h, w, config))
