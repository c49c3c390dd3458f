"""Explorer CLI smoke tests driven through the real command-line surface."""

import os
import subprocess
import sys

import pytest

from dcsexplorer_tpu.compiler import romgen

from .test_romgen import _make_spec

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def rom_zip(tmp_path_factory):
    path = tmp_path_factory.mktemp("rom") / "synth.zip"
    path.write_bytes(romgen.RomBuilder(_make_spec()).build_zip())
    return str(path)


def _run(args):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, "-m", "dcsexplorer_tpu.tools.explorer", *args],
        capture_output=True, text=True, env=env, timeout=600)


def test_cli_info(rom_zip):
    r = _run([rom_zip])
    assert r.returncode == 0, r.stderr
    assert "ROM check:   OK" in r.stdout
    assert "Tracks:      8" in r.stdout


def test_cli_listings(rom_zip):
    r = _run([rom_zip, "--tracks", "--streams", "--ditables"])
    assert r.returncode == 0, r.stderr
    assert "Track $0001" in r.stdout
    assert "kbps" in r.stdout
    assert "Table $01" in r.stdout


def test_cli_validate(rom_zip):
    r = _run([rom_zip, "--validate", "--max-track-frames", "60",
              "--platform", "cpu"])
    assert r.returncode == 0, r.stderr
    assert "Validation Succeeded" in r.stdout


def test_cli_bad_rom(tmp_path):
    bad = tmp_path / "bad.zip"
    bad.write_bytes(b"PK\x05\x06" + b"\x00" * 18)   # empty zip
    r = _run([str(bad)])
    assert r.returncode == 2
    assert "error" in r.stderr


def test_cli_missing_file():
    r = _run(["/nonexistent/rom.zip"])
    assert r.returncode == 2
