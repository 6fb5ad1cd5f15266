"""Fixtures, image IO, and profiling utilities."""

from . import fixtures, imageio, profiling  # noqa: F401
