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


def test_bench_scaling_history_merge():
    """BENCH_SCALING.json retains every session of the round under
    "sessions" (deduped by measured_at), so one noisy epoch cannot
    become the artifact's only scaling evidence."""
    import importlib.util
    import sys

    spec = importlib.util.spec_from_file_location(
        "bench_mod", "/root/repo/bench.py")
    bench = importlib.util.module_from_spec(spec)
    sys.modules["bench_mod"] = bench
    spec.loader.exec_module(bench)

    s1 = {"scaling_efficiency": 0.9, "measured_at": "t1"}
    s2 = {"scaling_efficiency": 0.7, "measured_at": "t2"}
    s3 = {"scaling_efficiency": 0.85, "measured_at": "t3"}
    p1 = bench._merge_scaling_history({}, dict(s1))
    assert p1["session_efficiencies"] == [0.9]
    p2 = bench._merge_scaling_history(p1, dict(s2))
    assert p2["session_efficiencies"] == [0.9, 0.7]
    p3 = bench._merge_scaling_history(p2, dict(s3))
    assert p3["session_efficiencies"] == [0.9, 0.7, 0.85]
    assert [s["measured_at"] for s in p3["sessions"]] == ["t1", "t2", "t3"]
    # top-level latest fields never leak the nested history
    assert all("sessions" not in s for s in p3["sessions"])
    # the prior top-level entry (already present in its own sessions
    # list) is deduped by measured_at, never double-counted
    p4 = bench._merge_scaling_history(
        p3, {"scaling_efficiency": 0.8, "measured_at": "t4"})
    assert p4["session_efficiencies"] == [0.9, 0.7, 0.85, 0.8]
