"""CLI — ``python -m dabloomray <cmd>``.

Commands mirror the reference's entry points plus the Ray pipelines:

  words-test   reference correctness harness (src/test_dablooms.c
               ≈L120–300 semantics; prints the print_results ≈L80 table)
  build        distributed sketch build over a parquet key column,
               checkpointed + resumable (--ckpt-dir)
  check        membership verdicts for a parquet key column against a
               checkpointed sketch table
  webtext      the flagship e2e pipeline (dedup → extract → stats →
               parquet out)

Each command owns its Ray session (guarded init; the driver-facing
``__ray_entry__`` never calls ray.init).  On a real cluster, submit
the same commands with ``ray job submit -- python -m dabloomray ...``.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_words_test(args) -> int:
    """Reference suite over the F2 words fixture: add evens with id=i,
    remove every 4th, check all; fail on any false negative or
    FPR > bound (bloom_score/print_results, src/test_dablooms.c ≈L60–80)."""
    from .compat import Dablooms, load_dablooms
    from .fixtures import make_words

    t_gen = time.time()
    words = make_words(args.n).column("word").to_pylist()
    ids = list(range(len(words)))
    kept = [w for i, w in enumerate(words) if i % 2 == 0 and i % 4 != 0]
    never = words[1::2]
    t_gen = time.time() - t_gen
    bloom = Dablooms(args.capacity, args.error_rate, args.file)
    t0 = time.time()
    bloom.add_batch(words[0::2], ids[0::2])
    bloom.delete_batch(words[0::4], ids[0::4])
    bloom.flush()
    bloom = load_dablooms(args.capacity, args.error_rate, args.file)
    v_kept = bloom.check_batch(kept)
    v_never = bloom.check_batch(never)
    fn = int((~v_kept).sum())
    fp = int(v_never.sum())
    tn = len(never) - fp
    fpr = fp / max(1, fp + tn)
    size_bytes = sum(len(b.pack()) for b in bloom._bloom.blooms)
    # the reference's print_results table (src/test_dablooms.c ≈L80)
    print(f"Elements added:   {len(words[0::2]):10d}")
    print(f"Elements removed: {len(words[0::4]):10d}")
    print(f"Total size:       {size_bytes:10d} bytes")
    print(f"False positives:  {fp:10d}")
    print(f"False negatives:  {fn:10d}")
    print(f"False positive rate: {fpr:.4f}")
    ops_sec = time.time() - t0
    n_ops = len(words[0::2]) + len(words[0::4]) + len(kept) + len(never)
    print(f"Sketch ops wall: {ops_sec:.2f}s "
          f"({n_ops / max(ops_sec, 1e-9):,.0f} ops/s incl. "
          f"flush+reopen; fixture gen excluded: {t_gen:.2f}s); "
          f"sub-filters: {len(bloom._bloom.blooms)}")
    if fn:
        print("ERROR: False negative", file=sys.stderr)
        return 1
    if fpr > args.error_rate:
        print(f"ERROR: FPR {fpr:.4f} > bound {args.error_rate}",
              file=sys.stderr)
        return 1
    print("TESTS PASSED")
    return 0


def cmd_build(args) -> int:
    _ray()
    from .params import ScalingPolicy
    from .pipelines.core import build_scaling_bloom_checkpointed
    from .sources.corpus import read_corpus

    ds = read_corpus(args.input, columns=[args.key, args.seq],
                     validate=False)
    import pyarrow as pa
    import pyarrow.compute as pc

    if args.seq != "seq_id":
        ds = ds.map_batches(
            lambda t, c=args.seq: t.append_column(
                "seq_id", pc.cast(t.column(c), pa.int64())),
            batch_format="pyarrow")
    table = build_scaling_bloom_checkpointed(
        ds, args.key, "seq_id", args.ckpt_dir,
        policy=ScalingPolicy(capacity0=args.capacity,
                             target_error=args.error_rate),
        num_partitions=args.partitions,
        lineage={"input": args.input, "key": args.key},
        fragment_every=args.fragment_every,
    )
    print(json.dumps({"partitions": table.num_rows,
                      "rows_processed": int(pa_sum(table, "count")),
                      "ckpt_dir": args.ckpt_dir}))
    return 0


def pa_sum(table, col):
    import pyarrow.compute as pc

    return pc.sum(table.column(col)).as_py() or 0


def cmd_check(args) -> int:
    _ray()
    from .checkpoint import read_checkpoint, read_manifest
    from .pipelines.core import check_membership
    from .sources.corpus import read_corpus

    sketch_table = read_checkpoint(args.ckpt_dir)
    man = read_manifest(args.ckpt_dir) or {}
    ds = read_corpus(args.input, columns=[args.key], validate=False)
    out = check_membership(ds, sketch_table, args.key,
                           num_partitions=man.get("num_partitions"))
    out.write_parquet(args.output)
    print(json.dumps({"output": args.output}))
    return 0


def cmd_webtext(args) -> int:
    _ray()
    from .params import ScalingPolicy
    from .pipelines.webtext import webtext_pipeline, webtext_pipeline_resumable

    t0 = time.time()
    policy = ScalingPolicy(capacity0=args.capacity,
                           target_error=args.error_rate)
    if args.resumable:
        man = webtext_pipeline_resumable(
            args.input, args.output, policy=policy,
            num_partitions=args.partitions)
        print(json.dumps({"output": args.output,
                          "shards": len(man["shards"]),
                          "sec": round(time.time() - t0, 2)}))
    else:
        webtext_pipeline(
            args.input, out_dir=args.output, policy=policy,
            num_partitions=args.partitions,
        )
        print(json.dumps({"output": args.output,
                          "sec": round(time.time() - t0, 2)}))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="dabloomray")
    sub = p.add_subparsers(dest="cmd", required=True)

    w = sub.add_parser("words-test", help="reference correctness harness")
    w.add_argument("--n", type=int, default=120_000)
    w.add_argument("--capacity", type=int, default=100_000)
    w.add_argument("--error-rate", type=float, default=0.05)
    w.add_argument("--file", default="/tmp/dabloomray_words.parquet")
    w.set_defaults(fn=cmd_words_test)

    b = sub.add_parser("build", help="checkpointed scaling-bloom build")
    b.add_argument("input")
    b.add_argument("--key", default="url")
    b.add_argument("--seq", default="warc_ts")
    b.add_argument("--capacity", type=int, default=100_000)
    b.add_argument("--error-rate", type=float, default=0.05)
    b.add_argument("--partitions", type=int, default=32)
    b.add_argument("--ckpt-dir", required=True)
    b.add_argument("--fragment-every", type=int, default=None,
                   help="mid-partition checkpoint every N applied rows "
                        "(fragment-level resume)")
    b.set_defaults(fn=cmd_build)

    c = sub.add_parser("check", help="membership verdicts vs checkpoint")
    c.add_argument("input")
    c.add_argument("--key", default="url")
    c.add_argument("--ckpt-dir", required=True)
    c.add_argument("--output", required=True)
    c.set_defaults(fn=cmd_check)

    e = sub.add_parser("webtext", help="flagship e2e pipeline")
    e.add_argument("input")
    e.add_argument("--output", required=True)
    e.add_argument("--capacity", type=int, default=50_000)
    e.add_argument("--error-rate", type=float, default=0.05)
    e.add_argument("--partitions", type=int, default=32)
    e.add_argument("--resumable", action="store_true",
                   help="per-input-shard output dirs + manifest; rerun "
                        "skips finished shards")
    e.set_defaults(fn=cmd_webtext)

    args = p.parse_args(argv)
    rc = args.fn(args)
    import ray

    if ray.is_initialized():
        ray.shutdown()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
