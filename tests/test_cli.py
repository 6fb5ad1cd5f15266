"""CLI smoke tests (in-process, xla backend on CPU)."""

import numpy as np
import pytest

from metalhuffman_tpu import cli
from metalhuffman_tpu.utils import fixtures, imageio


@pytest.fixture
def gray_file(tmp_path):
    img = fixtures.render_frame("16x16_ident")
    p = tmp_path / "in.gray"
    imageio.save_grayscale(img, p)
    return p, img


def test_encode_decode_roundtrip_files(tmp_path, gray_file, capsys):
    src, img = gray_file
    mht = tmp_path / "out.mht"
    out = tmp_path / "restored.gray"
    assert cli.main(["encode", str(src), str(mht), "--backend", "xla"]) == 0
    assert cli.main(["decode", str(mht), str(out), "--backend", "xla"]) == 0
    np.testing.assert_array_equal(imageio.load_grayscale(out), img)
    assert cli.main(["info", str(mht)]) == 0
    assert "MHT1" in capsys.readouterr().out


def test_roundtrip_command(gray_file, capsys):
    src, _ = gray_file
    assert cli.main(["roundtrip", str(src), "--backend", "xla"]) == 0
    assert "bit-exact" in capsys.readouterr().out


def test_roundtrip_pallas_interpret(gray_file):
    src, _ = gray_file
    assert cli.main(
        ["roundtrip", str(src), "--backend", "pallas", "--interpret"]
    ) == 0


def test_video_roundtrip_shared(tmp_path, capsys):
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (3, 24, 32), np.uint8)
    src = tmp_path / "frames.npy"
    np.save(src, frames)
    mhtv = tmp_path / "out.mhtv"
    outdir = tmp_path / "decoded.npy"
    assert cli.main(["encode-video", str(src), str(mhtv),
                     "--backend", "pallas", "--interpret"]) == 0
    assert cli.main(["info", str(mhtv)]) == 0
    assert "MHTV" in capsys.readouterr().out
    assert cli.main(["decode-video", str(mhtv), str(outdir),
                     "--backend", "pallas", "--interpret"]) == 0
    np.testing.assert_array_equal(np.load(outdir), frames)


def test_video_roundtrip_per_frame(tmp_path):
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, (2, 16, 16), np.uint8)
    src = tmp_path / "frames.npy"
    np.save(src, frames)
    mhts = tmp_path / "out.mhts"
    outdir = tmp_path / "imgs"
    assert cli.main(["encode-video", str(src), str(mhts),
                     "--per-frame-tables", "--backend", "xla"]) == 0
    assert cli.main(["decode-video", str(mhts), str(outdir),
                     "--backend", "xla"]) == 0
    from metalhuffman_tpu.utils import imageio

    f0 = imageio.load_grayscale(outdir / "frame_00000.png")
    np.testing.assert_array_equal(f0, frames[0])


def test_decode_video_check_requires_pallas(tmp_path):
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, (2, 16, 16), np.uint8)
    src = tmp_path / "frames.npy"
    np.save(src, frames)
    mhtv = tmp_path / "out.mhtv"
    assert cli.main(["encode-video", str(src), str(mhtv),
                     "--backend", "pallas", "--interpret"]) == 0
    with pytest.raises(SystemExit, match="pallas"):
        cli.main(["decode-video", str(mhtv), str(tmp_path / "o.npy"),
                  "--check", "--backend", "native"])
    with pytest.raises(SystemExit, match="pallas"):
        cli.main(["decode-video", str(mhtv), str(tmp_path / "o.npy"),
                  "--check", "--backend", "xla"])


def test_decode_video_check_mhts(tmp_path):
    """--check covers MHTS too (per-frame checked decode; review finding)."""
    rng = np.random.default_rng(6)
    frames = rng.integers(0, 256, (2, 16, 16), np.uint8)
    src = tmp_path / "frames.npy"
    np.save(src, frames)
    mhts = tmp_path / "out.mhts"
    out = tmp_path / "o.npy"
    assert cli.main(["encode-video", str(src), str(mhts),
                     "--per-frame-tables", "--backend", "pallas",
                     "--interpret"]) == 0
    assert cli.main(["decode-video", str(mhts), str(out), "--check",
                     "--backend", "pallas", "--interpret"]) == 0
    np.testing.assert_array_equal(np.load(out), frames)


def test_video_zero_init_cli(tmp_path):
    """--zero-init is honored on the (default) shared-table video path."""
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, (2, 16, 24), np.uint8)
    src = tmp_path / "frames.npy"
    np.save(src, frames)
    mhtv = tmp_path / "out.mhtv"
    out = tmp_path / "o.npy"
    assert cli.main(["encode-video", str(src), str(mhtv), "--zero-init",
                     "--backend", "pallas", "--interpret"]) == 0
    from metalhuffman_tpu.models import frame_stream

    stream, *_ = frame_stream.read_shared(mhtv.read_bytes())
    assert stream.block_init is not None
    assert cli.main(["decode-video", str(mhtv), str(out),
                     "--backend", "pallas", "--interpret"]) == 0
    np.testing.assert_array_equal(np.load(out), frames)
