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


def test_build_then_check_no_false_negatives(tmp_path):
    """End-to-end CLI regression for the ADVICE r1 partition-count bug:
    build with far more partitions than keys (high partitions empty),
    then check — the manifest's num_partitions must route every key to
    the right bloom (zero false negatives)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    inp = str(tmp_path / "keys.parquet")
    keys = [f"key-{i}" for i in range(12)]
    pq.write_table(pa.table({
        "url": pa.array(keys, pa.string()),
        "warc_ts": pa.array(range(12), pa.int64()),
    }), inp)
    ckpt = str(tmp_path / "ckpt")
    out = run_cli("build", inp, "--key", "url", "--seq", "warc_ts",
                  "--capacity", "1000", "--partitions", "64",
                  "--ckpt-dir", ckpt)
    assert out.returncode == 0, out.stderr
    res = str(tmp_path / "verdicts")
    out = run_cli("check", inp, "--key", "url", "--ckpt-dir", ckpt,
                  "--output", res)
    assert out.returncode == 0, out.stderr
    got = pq.read_table(res)
    verdicts = dict(zip(got.column("url").to_pylist(),
                        got.column("member").to_pylist()))
    assert all(verdicts[k] for k in keys), verdicts
