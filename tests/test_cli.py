"""CLI surface: words-test subcommand end-to-end in a subprocess."""

import json
import subprocess
import sys


def run_cli(*args):
    return subprocess.run([sys.executable, "-m", "dabloomray", *args],
                          capture_output=True, text=True, cwd="/root/repo")


def test_words_test_passes(tmp_path):
    out = run_cli("words-test", "--n", "20000", "--capacity", "10000",
                  "--file", str(tmp_path / "b.parquet"))
    assert out.returncode == 0, out.stderr
    assert "TESTS PASSED" in out.stdout
    assert "False negatives:           0" in out.stdout


def test_unknown_subcommand_fails():
    out = run_cli("frobnicate")
    assert out.returncode != 0
    assert "invalid choice" in out.stderr


def test_missing_required_arg_fails():
    out = run_cli("check", "/tmp/x")
    assert out.returncode != 0
    assert "--ckpt-dir" in out.stderr
