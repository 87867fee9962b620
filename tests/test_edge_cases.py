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


# ---------------------------------------------------------------------------
# Degenerate-input sweep across pipeline entry points (VERDICT r4 #3):
# every public pipeline fn on empty / single-row / all-identical /
# no-match inputs must return a well-typed empty or identity result —
# never raise.  (The r4 regression was exactly this class.)
# ---------------------------------------------------------------------------

_BASE = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lambda mu nu xi omicron pi rho sigma tau upsilon")
_DOC_CASES = {
    "empty": [],
    "single": [_BASE],
    "identical": [_BASE] * 5,
    "nomatch": [_BASE,
                "one two three four five six seven eight nine ten",
                "red orange yellow green blue indigo violet gray",
                "north south east west up down left right middle"],
}


def _doc_ds(texts):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


@pytest.mark.parametrize("case", list(_DOC_CASES))
def test_degenerate_minhash_lsh_dedup(ray_session, case):
    from dabloomray.pipelines.dedup import minhash_lsh_dedup

    texts = _DOC_CASES[case]
    out = collect(minhash_lsh_dedup(_doc_ds(texts), "doc_id", "text",
                                    threshold=0.8, num_partitions=2))
    want = {"empty": 0, "single": 0, "identical": 10, "nomatch": 0}[case]
    assert out.num_rows == want, case
    if out.num_rows:
        assert {"left_id", "right_id", "jaccard"} <= set(out.column_names)


@pytest.mark.parametrize("case", list(_DOC_CASES))
def test_degenerate_simhash_dedup(ray_session, case):
    from dabloomray.pipelines.dedup import simhash_dedup

    texts = _DOC_CASES[case]
    out = collect(simhash_dedup(_doc_ds(texts), "doc_id", "text",
                                max_hamming=0))
    want = {"empty": 0, "single": 0, "identical": 10, "nomatch": 0}[case]
    assert out.num_rows == want, case


@pytest.mark.parametrize("case", list(_DOC_CASES))
@pytest.mark.parametrize("method", ["auto", "driver", "distributed", "star"])
def test_degenerate_near_dedup_keep_first(ray_session, case, method):
    from dabloomray.pipelines.dedup import near_dedup_keep_first

    texts = _DOC_CASES[case]
    out = sorted(r["doc_id"] for r in near_dedup_keep_first(
        _doc_ds(texts), "doc_id", "text", threshold=0.8,
        method=method).take_all())
    want = {"empty": [], "single": [0], "identical": [0],
            "nomatch": list(range(len(texts)))}[case]
    assert out == want, (case, method)


@pytest.mark.parametrize("case", list(_DOC_CASES))
@pytest.mark.parametrize("payload",
                         ["rows", "mask", "join", "rangemask", "auto"])
def test_degenerate_dedup_approx(ray_session, tmp_path, case, payload):
    texts = _DOC_CASES[case]
    import ray.data as rd

    ds = rd.from_arrow(pa.table({
        "url": pa.array(texts, pa.string()),
        "seq_id": pa.array(range(len(texts)), pa.int64()),
    }))
    kw = {}
    if payload == "rangemask":
        kw = {"spill_dir": str(tmp_path / f"rm_{case}"), "range_buckets": 4}
    out = collect(dedup_approx(ds, "url", "seq_id",
                               ScalingPolicy(capacity0=100,
                                             target_error=0.05),
                               num_partitions=2, payload=payload, **kw))
    want = {"empty": [], "single": [0], "identical": [0],
            "nomatch": list(range(len(texts)))}[case]
    got = sorted(out.column("seq_id").to_pylist()) if out.num_rows else []
    assert got == want, (case, payload)


def _emb_case(case):
    """Embedding tables mirroring the doc cases (unit vectors)."""
    if case == "empty":
        vecs, ids = np.zeros((0, 4)), []
    elif case == "single":
        vecs, ids = np.array([[1.0, 0, 0, 0]]), [0]
    elif case == "identical":
        vecs, ids = np.tile([0.5, 0.5, 0.5, 0.5], (5, 1)), list(range(5))
    else:  # nomatch: orthogonal
        vecs, ids = np.eye(4), list(range(4))
    import ray.data as rd

    flat = pa.array(vecs.ravel(), pa.float64())
    col = pa.FixedSizeListArray.from_arrays(flat, 4)
    return rd.from_arrow(pa.table({"emb_id": pa.array(ids, pa.int64()),
                                   "vec": col}))


@pytest.mark.parametrize("case", list(_DOC_CASES))
def test_degenerate_blocked_cosine_pairs(ray_session, case):
    from dabloomray.pipelines.similarity import blocked_cosine_pairs

    out = collect(blocked_cosine_pairs(_emb_case(case), "emb_id", "vec",
                                       threshold=0.9))
    want = {"empty": 0, "single": 0, "identical": 10, "nomatch": 0}[case]
    assert out.num_rows == want, case


@pytest.mark.parametrize("case", list(_DOC_CASES))
def test_degenerate_ivf_knn(ray_session, case):
    from dabloomray.pipelines.similarity import ivf_knn

    ds = _emb_case(case)
    out = collect(ivf_knn(ds, [0], "emb_id", "vec", k=3, nlist=2,
                          nprobe=2))
    if case in ("empty", "single"):   # no corpus / only self
        assert out.num_rows == 0, case
    elif case == "identical":
        assert out.num_rows == 3      # k=3 of the 4 other copies
        assert set(out.column("neighbor_id").to_pylist()) <= {1, 2, 3, 4}
    else:  # orthogonal: neighbors exist but at cos 0
        assert out.num_rows <= 3
        assert all(abs(s) < 1e-9 for s in out.column("cos_sim").to_pylist())


@pytest.mark.parametrize("case", list(_DOC_CASES))
def test_degenerate_lsh_neardup_pairs(ray_session, case):
    from dabloomray.pipelines.similarity import lsh_neardup_pairs

    out = collect(lsh_neardup_pairs(_emb_case(case), "emb_id", "vec",
                                    dim=4, threshold=0.9, nbits=2))
    want = {"empty": 0, "single": 0, "identical": 10, "nomatch": 0}[case]
    assert out.num_rows == want, case
