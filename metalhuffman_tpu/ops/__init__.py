"""Device compute paths: Pallas decode kernel, XLA decode/encode, layout."""

from . import decode_pallas, decode_xla, encode_xla, layout  # noqa: F401
