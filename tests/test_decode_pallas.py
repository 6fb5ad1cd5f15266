"""Pallas decode kernel vs the XLA/NumPy oracles (interpret mode on CPU).

The TPU analog of the reference's CPU-oracle strategy (SURVEY.md section 4):
``interpret=True`` is the "serial reference decoder" role; the same kernel
runs compiled on hardware (exercised by bench.py / __graft_entry__).
"""

import numpy as np
import pytest

from metalhuffman_tpu.core import blocks, delta, encode_symbols
from metalhuffman_tpu.ops import decode_pallas


def _roundtrip(img, use_delta=True):
    blk = blocks.image_to_blocks(img)
    payload = delta.delta_encode_blocks(blk) if use_delta else blk
    enc = encode_symbols(payload.ravel(), block_size=64)
    out = np.asarray(
        decode_pallas.decode_stream_pallas(enc, delta=use_delta, interpret=True)
    )
    np.testing.assert_array_equal(out, blk)


@pytest.mark.parametrize("use_delta", [True, False], ids=["delta", "nodelta"])
def test_random_image(use_delta):
    rng = np.random.default_rng(0)
    _roundtrip(rng.integers(0, 256, (64, 96), np.uint8), use_delta)


def test_gradient_image():
    _roundtrip(np.add.outer(np.arange(40), np.arange(56)).astype(np.uint8))


def test_constant_image():
    _roundtrip(np.full((24, 24), 130, np.uint8))


def test_long_codes():
    rng = np.random.default_rng(7)
    p = 0.6 ** np.arange(200)
    data = rng.choice(np.arange(200), size=64 * 130, p=p / p.sum()).astype(np.uint8)
    enc = encode_symbols(data, block_size=64)
    assert enc.widths.max() > 8
    out = np.asarray(
        decode_pallas.decode_stream_pallas(enc, delta=False, interpret=True)
    )
    np.testing.assert_array_equal(out.ravel(), data)


def test_partial_tile_padding():
    # 3 blocks << one 1024-block tile: padded lanes must decode harmlessly.
    rng = np.random.default_rng(9)
    data = rng.integers(0, 256, 64 * 3, np.uint8)
    enc = encode_symbols(data, block_size=64)
    out = np.asarray(
        decode_pallas.decode_stream_pallas(enc, delta=False, interpret=True)
    )
    assert out.shape == (3, 64)
    np.testing.assert_array_equal(out.ravel(), data)


def test_bucket_edge_low_entropy():
    # Regression: widths {1,2,2} with ~124-bit blocks used to land exactly on
    # the 6-word row bucket while the last refill group's word index reached
    # width-2, outside the kernel's word-select range — decoding positions
    # 60..63 of unluckily-aligned blocks wrong (ADVICE.md round-1 high).
    rng = np.random.default_rng(42)
    nb = 50
    blks = []
    for _ in range(nb):
        # 60 two-bit codes then 4 one-bit codes: 124-bit block whose final
        # group starts 120 bits deep.
        blks.append(np.concatenate([
            rng.integers(0, 2, 60).astype(np.uint8),  # symbols 0/1 (2-bit)
            np.full(4, 2, np.uint8),                  # symbol 2 (1-bit)
        ]))
    # enough all-2 blocks to make symbol 2 the most frequent -> width 1
    for _ in range(nb):
        blks.append(np.full(64, 2, np.uint8))
    data = np.concatenate(blks)
    enc = encode_symbols(data, block_size=64)
    assert sorted(enc.widths[enc.widths > 0].tolist()) == [1, 2, 2]
    from metalhuffman_tpu.ops import layout
    total_bits = 8 * enc.code_bytes.size - 16
    assert layout.max_block_bits(enc.block_offsets, total_bits) == 124
    out = np.asarray(
        decode_pallas.decode_stream_pallas(enc, delta=False, interpret=True)
    )
    np.testing.assert_array_equal(out.ravel(), data)


def test_canonical_meta_intervals():
    # Interval arithmetic must agree with the LUT for every 16-bit window.
    from metalhuffman_tpu.core import canonical, tables

    rng = np.random.default_rng(3)
    data = rng.choice(
        [0, 1, 2, 7, 90, 255], size=6000, p=[0.55, 0.2, 0.1, 0.08, 0.05, 0.02]
    ).astype(np.uint8)
    w = canonical.huffman_code_lengths(canonical.symbol_frequencies(data))
    sym_plane, w_plane = tables.build_single_table(w)
    meta = decode_pallas.canonical_meta(w)

    windows = np.arange(65536, dtype=np.int64)
    widths = np.ones(65536, dtype=np.int64)
    adj = np.full(65536, meta.adj_inc[0], dtype=np.int64)
    for L in range(2, 17):
        m = windows >= meta.bounds[L - 1]
        widths += m
        adj += m * meta.adj_inc[L - 1]
    idx = adj + (windows >> (16 - widths))
    pair = meta.pair_table[0].astype(np.int64)
    syms = np.where((idx & 1) == 1, pair[idx >> 1] >> 8, pair[idx >> 1]) & 0xFF
    valid = w_plane > 0
    np.testing.assert_array_equal(widths[valid], w_plane[valid])
    np.testing.assert_array_equal(syms[valid], sym_plane[valid])


@pytest.mark.parametrize("stride", [2, 4])
def test_forced_stride_refill_scan(stride, monkeypatch):
    """The compiled-mode stride-S refill scan, forced through interpret.

    Production chooses stride 2 only when compiling for real hardware
    (interpret keeps stride 1 — the unrolled scan's traced op count made
    the whole suite ~3x slower); this test forces the stride branch so the
    suite still covers it bit-exactly. Wide-table content makes every late
    group take the scanned (lo < hi) path.
    """
    monkeypatch.setattr(decode_pallas, "_FORCE_STRIDE", stride)
    rng = np.random.default_rng(17)
    p = 0.6 ** np.arange(200)
    data = rng.choice(np.arange(200), size=64 * 40, p=p / p.sum()).astype(
        np.uint8)
    enc = encode_symbols(data, block_size=64)
    assert enc.widths.max() > 8  # wide scan ranges in the late groups
    out = np.asarray(
        decode_pallas.decode_stream_pallas(enc, delta=False, interpret=True))
    np.testing.assert_array_equal(out.ravel(), data)
