"""Null / empty / degenerate input robustness across the pipeline
surface (real corpora have null html, empty strings, empty partitions)."""

import numpy as np
import pyarrow as pa
import pytest

from dabloomray.extract import extract_text, extract_text_batch
from dabloomray.params import BloomParams, ScalingPolicy
from dabloomray.pipelines.core import (
    build_sketch_hashed,
    check_membership,
    dedup_approx,
)
from dabloomray.serde import rows_to_table, sketch_to_row, table_to_sketches
from dabloomray.sketches.counting import CountingBloom, counting_bloom_factory
from dabloomray.stages.text import QualityScore, token_count_whitespace


def collect(ds):
    batches = list(ds.iter_batches(batch_size=None, batch_format="pyarrow"))
    if not batches:
        return pa.table({})
    return pa.concat_tables(batches)


def test_extract_null_and_empty_html():
    t = pa.table({"html": pa.array([None, b"", b"<body>x</body>"],
                                   pa.binary())})
    out = extract_text_batch(t)
    assert out.column("text").to_pylist() == ["", "", "x"]
    assert extract_text(None) == ""


def test_hashing_null_keys():
    from dabloomray.hashing import murmur3_x64_128_batch

    arr = pa.array(["a", None, "b"], pa.string())
    h1, h2 = murmur3_x64_128_batch(arr, seed=1)
    # nulls hash as empty string (documented fill)
    e1, _ = murmur3_x64_128_batch([""], seed=1)
    assert h1[1] == e1[0]


def test_quality_and_tokens_on_nulls():
    t = pa.table({"text": pa.array([None, "", "a b"], pa.string())})
    out = QualityScore()(token_count_whitespace(t))
    assert out.column("n_tokens").to_pylist()[1:] == [0, 2]
    assert out.column("q_score").to_pylist()[0] == \
        out.column("q_score").to_pylist()[1]  # null == empty


def test_empty_dataset_through_pipelines(ray_session):
    import ray.data as rd

    empty = rd.from_arrow(pa.table({
        "url": pa.array([], pa.string()),
        "seq_id": pa.array([], pa.int64()),
    }))
    for payload in ("mask", "join"):  # join = two-phase block gather
        out = collect(dedup_approx(empty, "url", "seq_id",
                                   ScalingPolicy(capacity0=100,
                                                 target_error=0.05),
                                   num_partitions=2, payload=payload))
        assert out.num_rows == 0, payload

    built = collect(build_sketch_hashed(empty, "url",
                                        counting_bloom_factory(100, 0.05),
                                        num_partitions=2))
    # no rows → no groups → empty sketch table is acceptable
    assert built.num_rows == 0


def test_check_membership_empty_sketch_table(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"url": pa.array(["a", "b"], pa.string())}))
    cb = CountingBloom(BloomParams(10, 0.05))  # empty filter
    table = rows_to_table([sketch_to_row(cb, part_id=0)])
    out = collect(check_membership(ds, table, "url", partitioned=False,
                                   concurrency=1))
    assert out.column("member").to_pylist() == [False, False]


def test_dedup_all_duplicates(ray_session):
    import ray.data as rd

    t = pa.table({"url": pa.array(["same"] * 500, pa.string()),
                  "seq_id": pa.array(np.arange(500, dtype=np.int64))})
    ds = rd.from_arrow(t).repartition(3)
    out = collect(dedup_approx(ds, "url", "seq_id",
                               ScalingPolicy(capacity0=100,
                                             target_error=0.05),
                               num_partitions=2, payload="mask"))
    assert out.num_rows == 1
    assert out.column("seq_id")[0].as_py() == 0  # earliest survives
