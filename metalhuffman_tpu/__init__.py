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
