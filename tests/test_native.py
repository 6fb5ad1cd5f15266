"""Differential tests: C++ native codec vs the NumPy mirror (bit-identical)."""

import numpy as np
import pytest

from metalhuffman_tpu import native
from metalhuffman_tpu.core import bitstream, canonical, decode_ref, delta, encode, tables

pytestmark = pytest.mark.skipif(
    not native.available(), reason=f"native build unavailable: {native.backend_name()}"
)


def _datasets():
    rng = np.random.default_rng(42)
    yield "uniform", rng.integers(0, 256, 64 * 200, np.uint8)
    yield "skewed", rng.choice(
        np.arange(200), size=64 * 300, p=(p := 0.6 ** np.arange(200)) / p.sum()
    ).astype(np.uint8)
    yield "constant", np.full(64 * 10, 9, np.uint8)
    yield "two", np.tile(np.array([3, 200], np.uint8), 64 * 8)
    yield "sparse", np.where(
        rng.random(64 * 100) < 0.97, 0, rng.integers(1, 256, 64 * 100)
    ).astype(np.uint8)
    # Adversarial: exponential frequencies force >16-bit optimal codes,
    # exercising package-merge length limiting in both implementations.
    counts = [2**i for i in range(24)]
    adv = np.concatenate([np.full(c, i, np.uint8) for i, c in enumerate(counts)])
    yield "adversarial", adv[: (adv.size // 64) * 64]


@pytest.mark.parametrize("name,data", list(_datasets()), ids=lambda v: v if isinstance(v, str) else "")
def test_code_lengths_match(name, data):
    freqs = canonical.symbol_frequencies(data)
    np.testing.assert_array_equal(
        native.code_lengths(freqs), canonical.huffman_code_lengths(freqs)
    )


@pytest.mark.parametrize("name,data", list(_datasets()), ids=lambda v: v if isinstance(v, str) else "")
def test_encode_streams_identical(name, data):
    enc_np = encode.encode_symbols(data, block_size=64)
    enc_cc = native.encode_symbols(data, block_size=64)
    np.testing.assert_array_equal(enc_cc.widths, enc_np.widths)
    np.testing.assert_array_equal(enc_cc.code_bytes, enc_np.code_bytes)
    np.testing.assert_array_equal(enc_cc.block_offsets, enc_np.block_offsets)
    assert enc_cc.num_symbols == enc_np.num_symbols


def test_canonical_codes_match():
    rng = np.random.default_rng(1)
    data = rng.integers(0, 256, 4096, np.uint8)
    w = canonical.huffman_code_lengths(canonical.symbol_frequencies(data))
    np.testing.assert_array_equal(
        native.canonical_codes(w), canonical.canonical_codes(w)
    )


def test_native_decode_serial_roundtrip():
    rng = np.random.default_rng(5)
    data = rng.integers(0, 256, 64 * 64, np.uint8)
    enc = native.encode_symbols(data, block_size=64)
    out = native.decode_serial(enc.code_bytes, enc.widths, data.size)
    np.testing.assert_array_equal(out, data)
    # and from a mid-stream block offset
    b = 17
    out_b = native.decode_serial(
        enc.code_bytes, enc.widths, 64, start_bit=int(enc.block_offsets[b])
    )
    np.testing.assert_array_equal(out_b, data[b * 64 : (b + 1) * 64])


def test_native_decode_matches_numpy_oracle():
    rng = np.random.default_rng(6)
    data = rng.choice([0, 1, 2, 5, 250], size=2048, p=[0.6, 0.2, 0.1, 0.07, 0.03]).astype(np.uint8)
    enc = native.encode_symbols(data, block_size=64)
    sym, w = tables.build_single_table(enc.widths)
    oracle = decode_ref.decode_single_table(enc.code_bytes, sym, w, data.size)
    np.testing.assert_array_equal(
        native.decode_serial(enc.code_bytes, enc.widths, data.size), oracle
    )


def test_delta_match():
    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, 64 * 33, np.uint8)
    enc_cc = native.delta_encode(data, 64)
    enc_np = delta.delta_encode_blocks(data.reshape(-1, 64)).ravel()
    np.testing.assert_array_equal(enc_cc, enc_np)
    np.testing.assert_array_equal(native.delta_decode(enc_cc, 64), data)


def test_encode_speed_sanity():
    # Native encode of ~3 MB must be far faster than the NumPy path.
    import time

    rng = np.random.default_rng(8)
    data = rng.integers(0, 64, 3_145_728, np.uint8)
    t0 = time.perf_counter()
    native.encode_symbols(data, block_size=64)
    dt = time.perf_counter() - t0
    assert dt < 2.0, f"native encode too slow: {dt:.2f}s"
