"""End-to-end codec pipelines (the framework's "model" layer).

The reference's single pipeline — grayscale image -> 8x8 blocks -> delta ->
canonical Huffman -> GPU decode -> image (``AAPLRenderer.m`` init + draw
loop) — becomes :class:`ImageCodec`; the 30-FPS video use-case it was built
for (``README.md:9-11``) becomes :mod:`frame_stream`.
"""

from . import color, frame_stream, stream_writer  # noqa: F401
from .image_codec import CodecConfig, ImageCodec  # noqa: F401
from .stream_writer import (  # noqa: F401
    ColorStreamingEncoder,
    MHTSStreamingEncoder,
    StreamingEncoder,
    TemporalStreamingEncoder,
)
