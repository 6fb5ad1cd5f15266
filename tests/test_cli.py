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
