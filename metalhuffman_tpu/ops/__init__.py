"""Device decode paths: XLA vectorized decode, Pallas TPU kernel, layout."""

from . import decode_xla, layout  # noqa: F401
