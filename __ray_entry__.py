"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in dabloomray) calls ``ray.init()`` / ``ray.shutdown()``.

``entry()``   — flagship webtext dedup + sketch pipeline on sf0.001.
``queries()`` — one callable per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent SQL for the exact-checkable ones;
sketch-estimate queries are registered without SQL (rows-only check)
and their error bounds are asserted in tests/.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# dabloomray must import on the DRIVER regardless of cwd.  NOTE: Ray
# workers inherit the driver's cwd (not its sys.path), so the Ray
# session must be started either with cwd=/root/repo (the graft driver
# does) or with PYTHONPATH=/root/repo — otherwise workers cannot
# deserialize the pipeline UDFs.
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO_ROOT)

SF_SMOKE = "/root/testdata/sf0.001"


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry() -> Any:
    """Flagship: approximate streaming dedup of documents by text key
    (partition-owned scaling blooms), the reference's raison d'être
    (SURVEY.md §2.6 "set ops / dedup")."""
    from dabloomray.params import ScalingPolicy
    from dabloomray.pipelines.core import dedup_approx

    docs = _read(SF_SMOKE, "documents")
    docs = docs.map_batches(
        lambda t: t.append_column("seq_id", t.column("doc_id")),
        batch_format="pyarrow",
    )
    out = dedup_approx(
        docs, key_col="text", seq_col="seq_id",
        policy=ScalingPolicy(capacity0=10_000, target_error=0.05),
        num_partitions=8,
    )
    return out.drop_columns(["seq_id", "part_id"])


# ---------------------------------------------------------------------------
# queries + oracles
# ---------------------------------------------------------------------------

def _q_dedup_documents_exact(sf_dir: str):
    from dabloomray.pipelines.core import dedup_exact

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return dedup_exact(docs, key_col="text", seq_col="doc_id").select_columns(
        ["doc_id", "text"]
    )


def _q_docs_per_lang(sf_dir: str):
    docs = _read(sf_dir, "documents", columns=["lang"])
    out = docs.groupby("lang").count()
    return out.map_batches(
        lambda t: t.rename_columns(["lang", "n"]), batch_format="pyarrow"
    )


def _q_membership_semijoin(sf_dir: str):
    """Bloom-gated semi-join: lineitem rows whose order has
    o_totalprice > 200000 (SURVEY.md §2.6 "joins / lookups").

    The bloom (built distributed, broadcast via ray.put — sketch-sized
    by design) pre-filters the big side inside ``map_batches``; the
    surviving CANDIDATES (true matches + bloom false positives — a
    tiny fraction of lineitem) are then verified with a bucketed
    ``Dataset.join(left_semi)`` against the hot-key set, which stays
    fully distributed (VERDICT r3 #3 — no driver collect / ``ray.put``
    of the key set; the old exact-key broadcast verify is gone).  The
    gate is what keeps the join's left side small at scale; the join
    kills false positives, so the result is exact."""
    import ray

    from dabloomray.pipelines.core import build_sketch
    from dabloomray.serde import table_to_sketches
    from dabloomray.sketches.counting import counting_bloom_factory

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    hot = orders.filter(expr="o_totalprice > 200000.0")
    hot = hot.map_batches(
        lambda t: t.append_column(
            "key", pc.cast(t.column("o_orderkey"), pa.string())
        ),
        batch_format="pyarrow",
    )
    sk_tab = pa.concat_tables(
        list(
            build_sketch(hot, "key", counting_bloom_factory(50_000, 0.01))
            .iter_batches(batch_size=None, batch_format="pyarrow")
        )
    )
    bloom = table_to_sketches(sk_tab)[0]
    bloom_ref = ray.put(bloom)

    class BloomGate:
        def __init__(self):
            self.bloom = ray.get(bloom_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            skeys = pc.cast(batch.column("l_orderkey"), pa.string())
            hit = self.bloom.check(skeys)  # approx gate (no false negatives)
            return batch.filter(pa.array(hit))

    from dabloomray.pipelines.dedup import drop_empty_blocks

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity",
                                            "l_returnflag"])
    cand = li.map_batches(BloomGate, batch_format="pyarrow",
                          concurrency=(1, 4))
    # strip stale-schema empties before the join (the Ray 2.49
    # empty-block wart: map ops pass zero-row blocks through with the
    # PRE-rename schema, which Dataset.join rejects) — both sides are
    # schema-changing maps over filtered data
    hot_keys = drop_empty_blocks(hot.map_batches(
        lambda t: t.select(["o_orderkey"]).rename_columns(["_hk"]),
        batch_format="pyarrow",
    ).materialize())
    cand = drop_empty_blocks(cand.materialize())
    if hot_keys is None or cand is None:  # no hot orders / no hits
        return pa.table({"l_returnflag": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64()),
                         "sum_qty": pa.array([], pa.float64())})
    # distributed exact verify: candidates (gate-bounded) semi-join the
    # hot keys in hash buckets — nothing key-set-sized on the driver
    gated = cand.join(hot_keys, join_type="left_semi", num_partitions=8,
                      on=("l_orderkey",), right_on=("_hk",))
    agg = gated.groupby("l_returnflag").aggregate(
        # named to match the oracle column names exactly
        __import__("ray").data.aggregate.Count(alias_name="n"),
        __import__("ray").data.aggregate.Sum("l_quantity", alias_name="sum_qty"),
    )
    return agg.map_batches(
        lambda t: t.set_column(
            t.column_names.index("sum_qty"), "sum_qty",
            pc.round(t.column("sum_qty"), 2),
        ),
        batch_format="pyarrow",
    )


def _collect(ds) -> pa.Table:
    return pa.concat_tables(
        list(ds.iter_batches(batch_size=None, batch_format="pyarrow"))
    )


def _global_sketch(ds, key_col, factory):
    from dabloomray.pipelines.core import build_sketch
    from dabloomray.serde import table_to_sketches

    return table_to_sketches(_collect(build_sketch(ds, key_col, factory)))[0]


def _q_distinct_users_hll(sf_dir: str):
    """HLL COUNT DISTINCT (SURVEY.md §2.5 A3).  At sf<=0.1 the sketch
    is still in exact sparse mode, so the DuckDB oracle matches
    exactly; the dense-mode ±1.04/sqrt(m) bound is asserted in
    tests/test_sketches.py."""
    from dabloomray.sketches.hll import hll_factory

    ev = _read(sf_dir, "events", columns=["user_id"])
    ev = ev.map_batches(
        lambda t: t.append_column("key", pc.cast(t.column("user_id"),
                                                 pa.string())),
        batch_format="pyarrow",
    )
    hll = _global_sketch(ev, "key", hll_factory(14))
    return pa.table({"n_distinct": pa.array([int(round(hll.estimate()))],
                                            pa.int64())})


def _q_event_type_freq_cms(sf_dir: str):
    """CMS point frequencies (SURVEY.md §2.5 A4).  Width 8192 >> 8
    distinct event types, so estimates collide with probability ~0 and
    match the exact GROUP BY oracle; the epsilon*N overcount bound is
    asserted in tests/test_sketches.py."""
    from dabloomray.sketches.cms import cms_factory

    ev = _read(sf_dir, "events", columns=["event_type"])
    cms = _global_sketch(ev, "event_type", cms_factory(8192, 4))
    types = sorted(ev.unique("event_type"))
    est = cms.estimate(types)
    return pa.table({"event_type": pa.array(types, pa.string()),
                     "n": pa.array(est.astype("int64"), pa.int64())})


def _q_value_quantiles_tdigest(sf_dir: str):
    """t-digest quantiles over events.value — approximate at the
    standard compression 200, so rows-only; rank-error bound asserted
    in tests/test_sketches.py and vs duckdb in
    tests/test_entry_queries.py.  The exact-regime variant below
    carries the hash-checked oracle."""
    from dabloomray.sketches.tdigest import tdigest_factory

    ev = _read(sf_dir, "events", columns=["value"])
    td = _global_sketch(ev, "value", tdigest_factory(200))
    qs = [0.5, 0.9, 0.99]
    return pa.table({"q": pa.array(qs, pa.float64()),
                     "value_est": pa.array(td.quantile(np.array(qs)),
                                           pa.float64())})


def _q_value_quantiles_tdigest_exact(sf_dir: str):
    """t-digest in its EXACT regime (compression 10^6 > pi*n/2 for
    every fixture sf, so the k1 scale function forbids absorbing ANY
    neighbour — all centroids stay weight-1 singletons through both
    the per-partition compress and the merge tree): quantile() is then
    np.interp over cum_i = i-0.5, i.e. Hazen midpoint interpolation —
    the same exact SQL oracle family as nchars_quantiles_kll_exact.
    Distributed build + merge must reproduce it to hash-match."""
    from dabloomray.sketches.tdigest import tdigest_factory

    ev = _read(sf_dir, "events", columns=["value"])
    td = _global_sketch(ev, "value", tdigest_factory(1_000_000))
    qs = [0.25, 0.5, 0.75, 0.95]
    return pa.table({"q": pa.array(qs, pa.float64()),
                     "value_est": pa.array(
                         np.round(td.quantile(np.array(qs)), 6),
                         pa.float64())})


def _q_nchars_quantiles_kll(sf_dir: str):
    """KLL quantiles over documents.n_chars — approximate at k=200
    (level 0 compacts past 200 items), so rows-only; the exact-mode
    variant below carries the hash-checked oracle."""
    from dabloomray.sketches.kll import kll_factory

    docs = _read(sf_dir, "documents", columns=["n_chars"])
    kll = _global_sketch(docs, "n_chars", kll_factory(200))
    qs = [0.25, 0.5, 0.75, 0.95]
    return pa.table({"q": pa.array(qs, pa.float64()),
                     "value_est": pa.array(kll.quantile(np.array(qs)),
                                           pa.float64())})


def _q_nchars_quantiles_kll_exact(sf_dir: str):
    """KLL in its EXACT regime (k=8192 > corpus size ⇒ no level-0
    compaction; weights all 1): the distributed build + merge + query
    must equal Hazen midpoint interpolation over the sorted values —
    expressed exactly in the SQL oracle (VERDICT r2 #6 / ROADMAP #4).
    Both sides round to 6 decimals (identical double arithmetic:
    v_lo + (q*n - (i-0.5))*(v_hi - v_lo), unit-width segments)."""
    from dabloomray.sketches.kll import kll_factory

    docs = _read(sf_dir, "documents", columns=["n_chars"])
    kll = _global_sketch(docs, "n_chars", kll_factory(8192))
    qs = [0.25, 0.5, 0.75, 0.95]
    return pa.table({"q": pa.array(qs, pa.float64()),
                     "value_est": pa.array(
                         np.round(kll.quantile(np.array(qs)), 6),
                         pa.float64())})


def _q_docs_text_stats(sf_dir: str):
    """Vectorized token counting (Arrow count_substring_regex) +
    char length — text-analysis stage over documents."""
    from dabloomray.stages.text import token_count_whitespace

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = docs.map_batches(token_count_whitespace, batch_format="pyarrow")
    return out.map_batches(
        lambda t: t.append_column(
            "len_chars", pc.cast(pc.utf8_length(t.column("text")), pa.int64())
        ).select(["doc_id", "n_tokens", "len_chars"]),
        batch_format="pyarrow",
    )


def _q_docs_fingerprint_dedup(sf_dir: str):
    """Exact dedup keyed on the 128-bit content fingerprint instead of
    the full text — at 100 TB the shuffle moves 32-byte keys, not
    documents.  Collision odds ~n^2/2^128 ⇒ equals the GROUP BY text
    oracle."""
    from dabloomray.stages.text import fingerprint
    from ray.data.aggregate import Min

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    docs = docs.map_batches(fingerprint, batch_format="pyarrow")
    out = docs.select_columns(["fp", "doc_id"]).groupby("fp").aggregate(
        Min("doc_id", alias_name="doc_id"))
    return out.select_columns(["doc_id"])


def _q_embedding_neardup_pairs(sf_dir: str):
    """Exact cosine near-dup pairs (threshold 0.4 — the synthetic
    embeddings have no pairs above 0.52), via the DISTRIBUTED blocked
    all-pairs path (VERDICT r3 #1): triangle block-partition groupby,
    zero driver-side collect of the embedding matrix, no broadcast.
    The old ``cosine_neardup_pairs`` broadcast baseline is kept as the
    in-test parity reference (tests/test_similarity.py)."""
    from dabloomray.pipelines.similarity import blocked_cosine_pairs

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = blocked_cosine_pairs(emb, "vec_id", "embedding", threshold=0.4)
    return _typed_pair_table(out)


def _q_knn_embeddings(sf_dir: str):
    """Exact cosine top-10 for query vectors vec_id < 5 via the
    DISTRIBUTED IVF path at nprobe == nlist (every bucket scanned ⇒
    exact; VERDICT r3 #1): quantizer trained on a bounded sample,
    bucket scan via groupby — the corpus matrix is never collected.
    ``knn_topk`` (driver-broadcast brute force) stays as the in-test
    parity reference."""
    from dabloomray.pipelines.similarity import ivf_knn

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = ivf_knn(emb, query_ids=[0, 1, 2, 3, 4], id_col="vec_id",
                  vec_col="embedding", k=10, nlist=16, nprobe=16)
    return out.select_columns(["query_id", "neighbor_id"])


def _q_minhash_dedup_pairs(sf_dir: str):
    """MinHash-LSH near-dup pairs, Jaccard >= 0.8 verified exactly.
    NEW r3: full EXACT DuckDB oracle — the SQL computes word-3-gram
    set Jaccard with list kernels over the self-join, so banding,
    bucketed text joins and the vectorized hashed-set verify must all
    agree with brute force to hash-match.  (LSH detection at J>=0.9 —
    the fixture's pair range — is deterministic and exhaustive here;
    detection probability 1-(1-J^4)^32 > 1-1e-9.  Pair-LISTING
    exactness additionally needs every band bucket <= max_bucket, or
    star-linking would drop non-hub pairs the SQL contains —
    test_fixture_lsh_buckets_under_cap pins this.)"""
    from dabloomray.pipelines.dedup import minhash_lsh_dedup

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = minhash_lsh_dedup(docs, "doc_id", "text", threshold=0.8)
    return out.select_columns(["left_id", "right_id", "jaccard"])


def _q_simhash_dedup_pairs(sf_dir: str):
    """SimHash near-dup pairs, hamming <= 3 (rows-only driver check:
    hamming distance over simhash bits has no SQL equivalent; the
    hamming-0 degenerate below is the exact-checkable anchor)."""
    from dabloomray.pipelines.dedup import simhash_dedup

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return simhash_dedup(docs, "doc_id", "text", max_hamming=3)


def _typed_pair_table(ds) -> pa.Table:
    """Collect a (small, candidate-bounded) pair dataset to a typed
    (left_id, right_id) table — an all-empty (or None) result loses
    its schema (Ray empty-block wart), which would fail the driver's
    schema compare against the oracle."""
    schema = pa.schema([("left_id", pa.int64()), ("right_id", pa.int64())])
    tabs = [pa.table({"left_id": pa.array([], pa.int64()),
                      "right_id": pa.array([], pa.int64())}, schema=schema)]
    if ds is not None:
        for b in ds.iter_batches(batch_size=None, batch_format="pyarrow"):
            if b.num_columns:
                tabs.append(b.select(["left_id", "right_id"]).cast(schema))
    return pa.concat_tables(tabs)


def _q_simhash_pairs_exact(sf_dir: str):
    """SimHash at max_hamming=0 as a CANDIDATE GATE + exact
    text-equality verify — the degenerate exact oracle (the
    near_dedup_threshold1 pattern): identical texts always share the
    signature (recall 1 — all four pigeonhole chunks agree, so the
    pair is emitted deterministically), and the distributed verify
    (attach_pair_texts: semi-join corpus filter + bucketed joins, no
    driver text) drops the rare vote-collisions between DISTINCT
    texts (sf0.1 genuinely has 6 such signature aliases — the
    low-entropy word-salad fixture makes coinciding bit votes likely;
    test_fixture_simhash_aliases_documented records where the raw
    gate alone would already be exact).  Net: the whole band-explode →
    bucket-groupby → in-bucket verify → distinct_pairs → text-join
    stack must equal the text-equality self-join at EVERY sf.  (Same
    bucket-cap precondition as minhash_dedup_pairs: chunk buckets
    must stay <= max_bucket — test_fixture_lsh_buckets_under_cap.)"""
    import pyarrow.compute as _pc

    from dabloomray.pipelines.dedup import attach_pair_texts, simhash_dedup

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    cand = simhash_dedup(docs, "doc_id", "text", max_hamming=0)
    pairs = attach_pair_texts(cand, docs, "doc_id", "text")
    if pairs is None:
        return _typed_pair_table(None)

    def verify(t: pa.Table) -> pa.Table:
        keep = _pc.equal(t.column("left_text"), t.column("right_text"))
        return t.filter(keep).select(["left_id", "right_id"])

    return _typed_pair_table(
        pairs.map_batches(verify, batch_format="pyarrow"))


def _q_lang_id_counts(sf_dir: str):
    """Heuristic language-ID stage → predicted-language histogram
    (rows-only: the heuristic has no SQL equivalent)."""
    from dabloomray.stages.text import LangId

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = docs.map_batches(LangId, batch_format="pyarrow",
                           concurrency=(1, 4))
    out = out.groupby("lang_pred").count()
    return out.map_batches(
        lambda t: t.rename_columns(["lang_pred", "n"]), batch_format="pyarrow"
    )


def _q_source_counts_salted(sf_dir: str):
    """Salted two-phase grouped count (hot-key-safe aggregation,
    SURVEY.md §4.4) — result identical to a plain GROUP BY."""
    from dabloomray.pipelines.skew import salted_counts

    docs = _read(sf_dir, "documents", columns=["source"])
    return salted_counts(docs, "source", num_salts=8)


def _q_events_hourly(sf_dir: str):
    """Tumbling 1h event-time windows as a grouped aggregate (Ray Data
    has no watermarks; batch semantics == the SQL GROUP BY oracle)."""
    from dabloomray.pipelines.skew import tumbling_window_agg

    ev = _read(sf_dir, "events", columns=["ts", "event_type", "value"])
    out = tumbling_window_agg(ev, "ts", "event_type", width_seconds=3600)
    return out.map_batches(
        lambda t: t.set_column(
            t.column_names.index("sum_value"), "sum_value",
            pc.round(t.column("sum_value"), 2)),
        batch_format="pyarrow",
    )


def _q_top_users(sf_dir: str):
    """Top-20 users by event count — pre-aggregated groupby + tiny
    driver-side sort (never a global row sort)."""
    from dabloomray.pipelines.skew import top_k_by_count

    ev = _read(sf_dir, "events", columns=["user_id"])
    return top_k_by_count(ev, "user_id", k=20)


def _q_top_event_types_sketch(sf_dir: str):
    """CMS+heap heavy-hitters sketch (mergeable approximate top-k).
    With 8 event types against an 8192-wide CMS the estimates are
    collision-free, so this matches the exact GROUP BY oracle."""
    from dabloomray.sketches.topk import topk_factory

    ev = _read(sf_dir, "events", columns=["event_type"])
    sk = _global_sketch(ev, "event_type", topk_factory(5, 8192, 4))
    top = sk.top(5)
    return pa.table({
        "event_type": pa.array([k for k, _ in top], pa.string()),
        "n": pa.array([v for _, v in top], pa.int64()),
    })


def _q_purchase_after_signup(sf_dir: str):
    """As-of join pattern: for every purchase event, the latest
    signup of the same user at-or-before it (sort within user buckets,
    backward-looking cumulative max — the merge_asof shape from the
    join playbook).  Purchases with no prior signup are dropped, like
    the SQL inner-join oracle."""
    import pandas as pd

    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "ts",
                                          "event_type"])

    def asof(g: pd.DataFrame) -> pd.DataFrame:
        # signups sort BEFORE purchases at the same ts so the ffill
        # sees at-or-before signups — matching the inclusive oracle
        # predicate `s.ts <= p.ts`
        g = g.assign(_not_signup=(g["event_type"] != "signup"))
        g = g.sort_values(["ts", "_not_signup", "event_id"])
        # last signup at-or-before each row: mask + forward-fill
        # (NOT cummax — pandas cummax leaves NaT positions NaT)
        signup_ts = g["ts"].where(g["event_type"] == "signup").ffill()
        m = (g["event_type"] == "purchase") & signup_ts.notna()
        return pd.DataFrame({"event_id": g.loc[m, "event_id"],
                             "signup_ts": signup_ts[m]})

    return ev.groupby("user_id").map_groups(asof, batch_format="pandas")


def _q_orders_by_segment(sf_dir: str):
    """Hash-partitioned inner join (Dataset.join) of orders x customer,
    then grouped totals per market segment — the both-sides-large join
    pattern (small sides would broadcast instead, see
    membership_semijoin)."""
    from ray.data.aggregate import Count, Sum

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    joined = orders.join(cust, join_type="inner", num_partitions=8,
                         on=("o_custkey",), right_on=("c_custkey",))
    out = joined.groupby("c_mktsegment").aggregate(
        Count(alias_name="n_orders"),
        Sum("o_totalprice", alias_name="total"),
    )
    return out.map_batches(
        lambda t: t.set_column(t.column_names.index("total"), "total",
                               pc.round(t.column("total"), 0)),
        batch_format="pyarrow")


def _q_distinct_langs(sf_dir: str):
    """Exact distinct values (Dataset.unique — a shuffle)."""
    docs = _read(sf_dir, "documents", columns=["lang"])
    vals = sorted(docs.unique("lang"))
    return pa.table({"lang": pa.array(vals, pa.string())})


def _q_top_value_events(sf_dir: str):
    """Global sort + limit (Dataset.sort is a range-partitioned
    shuffle); deterministic tie-break on event_id."""
    ev = _read(sf_dir, "events", columns=["event_id", "value"])
    out = ev.sort(["value", "event_id"],
                  descending=[True, False]).limit(100)
    return out


def _q_pricing_summary(sf_dir: str):
    """TPC-H Q1-style grouped aggregate over lineitem — the canonical
    partial-aggregate + small-groupby pattern (sums rounded identically
    in Ray and SQL so float accumulation order can't flip the hash)."""
    from ray.data.aggregate import Count, Sum

    li = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_quantity",
                        "l_extendedprice", "l_discount"])
    li = li.map_batches(
        lambda t: t.append_column(
            "disc_price",
            pc.multiply(t.column("l_extendedprice"),
                        pc.subtract(pa.scalar(1.0), t.column("l_discount")))),
        batch_format="pyarrow")
    out = li.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("l_quantity", alias_name="sum_qty"),
        Sum("disc_price", alias_name="sum_disc_price"),
        Count(alias_name="count_order"),
    )
    return out.map_batches(
        lambda t: t.set_column(
            t.column_names.index("sum_qty"), "sum_qty",
            pc.round(t.column("sum_qty"), 2)
        ).set_column(
            t.column_names.index("sum_disc_price"), "sum_disc_price",
            pc.round(t.column("sum_disc_price"), 0)
        ),
        batch_format="pyarrow")


def _q_user_sessions(sf_dir: str):
    """Sessionization: per-user event streams split at >30-minute gaps
    (groupby(user).map_groups over ts-sorted groups — the
    streaming-shaped pattern from ray_guide; exact SQL oracle via
    LAG window)."""
    import pandas as pd

    ev = _read(sf_dir, "events", columns=["user_id", "ts"])

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].sort_values().to_numpy()
        gaps = np.diff(ts.astype("datetime64[us]").astype(np.int64))
        n_sessions = 1 + int((gaps > 30 * 60 * 1_000_000).sum())
        return pd.DataFrame({"user_id": [g["user_id"].iloc[0]],
                             "n_sessions": [n_sessions],
                             "n_events": [len(g)]})

    return ev.groupby("user_id").map_groups(sessions, batch_format="pandas")


def _q_docs_en_by_source(sf_dir: str):
    """Filter + grouped count with the predicate pushed into the
    parquet read (row-group pruning at the scan — SURVEY.md 'prune at
    the read')."""
    import ray.data as rd

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "lang"],
        filter=(pc.field("lang") == "en"),
    )
    out = docs.groupby("source").count()
    return out.map_batches(
        lambda t: t.rename_columns(["source", "n"]), batch_format="pyarrow"
    )


def _q_near_dedup_keep_first(sf_dir: str):
    """MinHash-LSH groups → keep the smallest doc_id per near-dup
    cluster.  NEW r3: EXACT DuckDB oracle — word-3-gram Jaccard pairs
    (list kernels) + a recursive-CTE transitive closure dropping every
    doc that can reach a smaller id, so LSH recall, the hashed-set
    verify, min-label component propagation AND the final anti-join
    all have to agree with brute force."""
    from dabloomray.pipelines.dedup import near_dedup_keep_first

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = near_dedup_keep_first(docs, "doc_id", "text", threshold=0.8)
    return out.select_columns(["doc_id"])


def _q_knn_ivf(sf_dir: str):
    """IVF (coarse-quantized) approximate kNN — the ANN scale path;
    rows-only (recall vs brute force asserted in tests; the
    nprobe=nlist degenerate below is the exact-checkable anchor)."""
    from dabloomray.pipelines.similarity import ivf_knn

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return ivf_knn(emb, query_ids=[0, 1, 2, 3, 4], id_col="vec_id",
                   vec_col="embedding", k=10, nlist=16, nprobe=6)


def _q_knn_ivf_full(sf_dir: str):
    """IVF kNN at nprobe == nlist: every bucket is scanned for every
    query, so the quantizer/assignment/bucket-scan/top-k plumbing must
    reproduce the brute-force result EXACTLY — same oracle as
    knn_embeddings (degenerate-parameter pattern, VERDICT r2 #3b)."""
    from dabloomray.pipelines.similarity import ivf_knn

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = ivf_knn(emb, query_ids=[0, 1, 2, 3, 4], id_col="vec_id",
                  vec_col="embedding", k=10, nlist=16, nprobe=16)
    return out.select_columns(["query_id", "neighbor_id"])


def _q_lsh_pairs_exhaustive(sf_dir: str):
    """Hyperplane-LSH cosine pairs at nbits=0 (one all-embracing
    bucket, cap disabled): the bucket groupby, vector-carrying rows,
    in-bucket exact cosine and pair dedup must reproduce the exact
    all-pairs result — same oracle as embedding_neardup_pairs.  At
    real scale nbits/ntables partition the work; this degenerate
    setting is the correctness anchor for the same code path."""
    from dabloomray.pipelines.similarity import lsh_neardup_pairs

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    dim = len(emb.take(1)[0]["embedding"])
    out = lsh_neardup_pairs(emb, "vec_id", "embedding", dim=dim,
                            threshold=0.4, nbits=0, ntables=1,
                            max_bucket=1 << 30)
    return _typed_pair_table(out)


def _q_scaling_remove_stream(sf_dir: str):
    """Distributed add/remove stream through the scaling-bloom chain
    (G2+G3 via op_col routing): every event key is added at seq 2*id,
    every 4th removed at seq 2*id+1 (the pydablooms suite pattern:
    test_pydablooms.py ≈L40 adds evens, deletes 4ths, checks all),
    then membership is checked for every key.  Rows-only driver check
    (removes are approximate: retained keys are NEVER false-negative —
    asserted in tests — while removed keys may still hit at the
    configured FPR, so no SQL equivalent); the verdict column is
    deterministic for a fixed fixture."""
    from dabloomray.params import ScalingPolicy
    from dabloomray.pipelines.core import build_scaling_bloom, check_membership

    ev = _read(sf_dir, "events", columns=["event_id"])

    def mk_stream(t: pa.Table) -> pa.Table:
        ids = t.column("event_id").to_numpy().astype(np.int64)
        keys = pc.cast(t.column("event_id"), pa.string()).combine_chunks()
        rm = ids % 4 == 0
        return pa.table({
            "key": pa.concat_arrays([keys, keys.filter(pa.array(rm))]),
            "seq": pa.array(np.concatenate([2 * ids, 2 * ids[rm] + 1]),
                            pa.int64()),
            "op": pa.array(["add"] * len(ids) + ["remove"] * int(rm.sum()),
                           pa.string()),
        })

    stream = ev.map_batches(mk_stream, batch_format="pyarrow")
    sk_tab = _collect(build_scaling_bloom(
        stream, "key", "seq",
        policy=ScalingPolicy(capacity0=2000, target_error=0.05),
        num_partitions=8, op_col="op"))
    keyed = ev.map_batches(
        lambda t: t.append_column(
            "key", pc.cast(t.column("event_id"), pa.string())),
        batch_format="pyarrow")
    out = check_membership(keyed, sk_tab, "key", num_partitions=8)
    return out.select_columns(["event_id", "member"])


def _q_supplier_by_nation(sf_dir: str):
    """Broadcast small-side dimension join: nation (25 rows) is
    ray.put once and looked up inside map_batches — zero shuffle of
    the supplier side (contrast with the hash-partitioned
    Dataset.join in orders_by_segment)."""
    from ray.data.aggregate import Count, Sum

    from dabloomray.stages.lookup import broadcast_join

    nation = _collect(_read(sf_dir, "nation",
                            columns=["n_nationkey", "n_name"]))
    sup = _read(sf_dir, "supplier", columns=["s_nationkey", "s_acctbal"])
    joined = broadcast_join(sup, nation, dim_key="n_nationkey",
                            key_col="s_nationkey", add_cols=["n_name"])
    out = joined.groupby("n_name").aggregate(
        Count(alias_name="n_suppliers"),
        Sum("s_acctbal", alias_name="total_bal"),
    )
    return out.map_batches(
        lambda t: t.set_column(
            t.column_names.index("total_bal"), "total_bal",
            pc.round(t.column("total_bal"), 2)),
        batch_format="pyarrow")


def _q_customers_by_region(sf_dir: str):
    """Two-hop broadcast dimension join (customer → nation → region):
    both dimension tables broadcast once; the customer side never
    shuffles."""
    from dabloomray.stages.lookup import broadcast_join

    nation = _collect(_read(sf_dir, "nation",
                            columns=["n_nationkey", "n_regionkey"]))
    region = _collect(_read(sf_dir, "region",
                            columns=["r_regionkey", "r_name"]))
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    j1 = broadcast_join(cust, nation, dim_key="n_nationkey",
                        key_col="c_nationkey", add_cols=["n_regionkey"])
    j2 = broadcast_join(j1, region, dim_key="r_regionkey",
                        key_col="n_regionkey", add_cols=["r_name"])
    out = j2.groupby("r_name").count()
    return out.map_batches(
        lambda t: t.rename_columns(["r_name", "n_customers"]),
        batch_format="pyarrow")


def _typed_user_table(ds) -> pa.Table:
    schema = pa.schema([("user_id", pa.int64())])
    tabs = [pa.table({"user_id": pa.array([], pa.int64())}, schema=schema)]
    if ds is not None:
        for b in ds.iter_batches(batch_size=None, batch_format="pyarrow"):
            if b.num_columns:
                tabs.append(b.select(["user_id"]).cast(schema))
    return pa.concat_tables(tabs)


def _set_op_sides(sf_dir: str):
    """Distinct users with a big (>150) purchase / error — the two
    sides of the set-op queries (non-trivial sets: every user has
    every event type, so the thresholds make membership selective)."""
    ev = _read(sf_dir, "events", columns=["user_id", "event_type",
                                          "value"])

    def only(evtype):
        def fn(t: pa.Table) -> pa.Table:
            keep = pc.and_(pc.equal(t.column("event_type"), evtype),
                           pc.greater(t.column("value"), 150.0))
            return t.filter(keep).select(["user_id"])
        return fn

    def first_row(g: pa.Table) -> pa.Table:
        return g.slice(0, 1)

    from dabloomray.pipelines.dedup import drop_empty_blocks

    purch = ev.map_batches(only("purchase"), batch_format="pyarrow") \
        .groupby("user_id").map_groups(first_row, batch_format="pyarrow")
    err = ev.map_batches(only("error"), batch_format="pyarrow") \
        .map_batches(lambda t: t.rename_columns(["_eu"]),
                     batch_format="pyarrow")
    # materialize BOTH sides before the set-op join: executed lazily,
    # the groupby sort-shuffle, the err-side map and the join's own
    # hash shuffle all contend for the same task slots (measured 108 s
    # for the anti variant vs ~2 s with sequenced sides at sf0.1); the
    # sides are distinct-user-sized, and the schema-changing rename
    # needs the stale-empty-block strip before Dataset.join anyway
    purch = drop_empty_blocks(purch.materialize())
    err = drop_empty_blocks(err.materialize())
    return purch, err


def _q_big_purchasers_without_big_error(sf_dir: str):
    """Set EXCEPT as a distributed anti-join (Dataset.join left_anti —
    the set-ops row of SURVEY §2.6 alongside dedup/distinct): users
    with a >150 purchase and NO >150 error."""
    purch, err = _set_op_sides(sf_dir)
    if purch is None:  # no qualifying purchases at all
        return _typed_user_table(None)
    if err is None:  # nothing to subtract
        return _typed_user_table(purch)
    out = purch.join(err, join_type="left_anti", num_partitions=8,
                     on=("user_id",), right_on=("_eu",))
    # an all-empty result loses its schema (Ray empty-block wart);
    # re-type it — the distinct-user result is driver-sized by contract
    return _typed_user_table(out)


def _q_big_purchasers_with_big_error(sf_dir: str):
    """Set INTERSECT as a distributed semi-join (left_semi): users
    with BOTH a >150 purchase and a >150 error."""
    purch, err = _set_op_sides(sf_dir)
    if purch is None or err is None:  # empty intersection by contract
        return _typed_user_table(None)
    out = purch.join(err, join_type="left_semi", num_partitions=8,
                     on=("user_id",), right_on=("_eu",))
    return _typed_user_table(out)


def _q_near_dedup_threshold1(sf_dir: str):
    """Keep-first near-dedup at threshold 1.0: the LSH candidate +
    exact-Jaccard verify + min-label component pipeline degenerates to
    exact dedup (identical shingle sets), giving the whole distributed
    near-dup stack an EXACT DuckDB oracle — every stage (banding,
    bucketed text joins, verification, component labels, anti-join)
    must be right for this to hash-match.

    Oracle-equivalence caveat (ADVICE r2): GROUP BY text is the
    pipeline's equivalence only because no two DISTINCT texts in this
    fixture share a word-3-gram shingle set (texts differing only in
    whitespace runs, or distinct <3-word texts with equal joins, would
    merge in the pipeline but not in SQL) — asserted for all sfs by
    tests/test_entry_queries.py::test_fixture_has_no_shingle_aliases."""
    from dabloomray.pipelines.dedup import near_dedup_keep_first

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = near_dedup_keep_first(docs, "doc_id", "text", threshold=1.0)
    return out.select_columns(["doc_id"])


def _q_docs_shingle_fingerprint(sf_dir: str):
    """Min-shingle (Karp-Rabin rolling hash) document fingerprints —
    the 1-perm minhash similarity fingerprint, vectorized via
    byte-pair polynomial tables (rows-only: no SQL equivalent; parity
    with the scalar reference asserted in tests/test_text.py)."""
    from dabloomray.stages.text import RollingFingerprint

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = docs.map_batches(RollingFingerprint, batch_format="pyarrow",
                           concurrency=(1, 4))
    return out.select_columns(["doc_id", "shingle_min"])


def _q_docs_as_images_dims(sf_dir: str):
    """Real multimodal round-trip with an EXACT SQL oracle: each doc
    is rendered into an actual P6 PPM byte payload whose dimensions
    are pure arithmetic of (doc_id, n_chars); the distributed
    ImageDecode stage then parses the REAL headers back (no fakes —
    stages/codecs.py pure-numpy netpbm parser).  The oracle computes
    the same arithmetic directly, so a hash-match proves the encode →
    binary column → actor-pool decode path reproduces dims exactly."""
    from dabloomray.stages.codecs import encode_ppm
    from dabloomray.stages.multimodal import ImageDecode

    docs = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def synth(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        nc = t.column("n_chars").to_numpy()
        heights = nc % 29 + 4
        widths = ids % 31 + 4
        blobs = []
        for h, w in zip(heights, widths):
            img = ((np.arange(int(h))[:, None] + np.arange(int(w))[None, :])
                   % 256).astype(np.uint8)
            blobs.append(encode_ppm(np.repeat(img[:, :, None], 3, axis=2)))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "content": pa.array(blobs, pa.binary())})

    media = docs.map_batches(synth, batch_format="pyarrow")
    out = media.map_batches(ImageDecode, batch_format="pyarrow",
                            concurrency=(1, 4))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "height": t.column("height").cast(pa.int64()),
            "width": t.column("width").cast(pa.int64()),
        })

    return out.map_batches(finish, batch_format="pyarrow")


def _q_docs_as_png_dims(sf_dir: str):
    """PNG sibling of ``docs_as_images_dims`` (VERDICT r4 #5): the
    same (doc_id, n_chars) dimension arithmetic, but each payload is a
    REAL compressed PNG (stages/codecs.py stdlib-zlib + numpy codec),
    with the scanline filter type cycling over doc_id % 5 so all five
    PNG unfilter paths run inside the distributed decode.  ImageDecode
    resolves dims through the decoder REGISTRY's built-in png entry —
    a hash-match proves the registry path end-to-end."""
    from dabloomray.stages.codecs import encode_png
    from dabloomray.stages.multimodal import ImageDecode

    docs = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def synth(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        nc = t.column("n_chars").to_numpy()
        heights = nc % 29 + 4
        widths = ids % 31 + 4
        blobs = []
        for i, (h, w) in enumerate(zip(heights, widths)):
            img = ((np.arange(int(h))[:, None] + np.arange(int(w))[None, :])
                   % 256).astype(np.uint8)
            blobs.append(encode_png(np.repeat(img[:, :, None], 3, axis=2),
                                    filter_type=int(ids[i]) % 5))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "content": pa.array(blobs, pa.binary())})

    media = docs.map_batches(synth, batch_format="pyarrow")
    out = media.map_batches(ImageDecode, batch_format="pyarrow",
                            concurrency=(1, 4))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "height": t.column("height").cast(pa.int64()),
            "width": t.column("width").cast(pa.int64()),
        })

    return out.map_batches(finish, batch_format="pyarrow")


def _q_docs_as_jpeg_decode(sf_dir: str):
    """JPEG sibling of ``docs_as_png_dims`` with a stronger claim: the
    payloads are REAL baseline JPEGs (stages/jpeg.py pure-numpy T.81
    codec) and the query round-trips the full distributed ENTROPY
    DECODE, not just the header: each doc becomes a constant-color
    JPEG (dims and color pure arithmetic of doc_id/n_chars; encoder
    knobs — 4:2:0 subsampling, restart intervals, non-interleaved
    scans, and since round 5 PROGRESSIVE (SOF2) files for doc_id % 7
    == 3 — cycle over doc_id so every decoder path runs).  A
    constant block is DC-only and the quality-90 DC quantizer is
    sub-half-level, so the decoded pixel is EXACTLY the encoded
    arithmetic in every mode (progressive reassembles the identical
    coefficient lattice) — hash-matched by the oracle alongside the
    dims that ImageDecode reads through the registry's header-only
    jpeg hook."""
    from dabloomray.stages.jpeg import encode_jpeg, encode_jpeg_progressive
    from dabloomray.stages.multimodal import ImageDecode, _decode_image

    docs = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def synth(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        nc = t.column("n_chars").to_numpy()
        heights = nc % 29 + 4
        widths = ids % 31 + 4
        vals = ids % 199 + 17
        blobs = []
        for i, (h, w, v) in enumerate(zip(heights, widths, vals)):
            img = np.full((int(h), int(w), 3), int(v), np.uint8)
            if ids[i] % 7 == 3:  # progressive payloads on the same
                # oracle: DC-only content reassembles exactly
                blobs.append(encode_jpeg_progressive(
                    img, quality=90,
                    subsample=bool(ids[i] % 2),
                    restart_interval=int(ids[i]) % 3))
            else:
                blobs.append(encode_jpeg(
                    img, quality=90,
                    subsample=bool(ids[i] % 2),
                    restart_interval=int(ids[i]) % 3,
                    interleave=bool((ids[i] >> 1) % 2)))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "content": pa.array(blobs, pa.binary())})

    media = docs.map_batches(synth, batch_format="pyarrow")
    dims = media.map_batches(ImageDecode, batch_format="pyarrow",
                             concurrency=(1, 4))

    def pixel(t: pa.Table) -> pa.Table:
        px = np.empty(len(t), np.int64)
        for i, b in enumerate(t.column("content")):
            img = _decode_image(b.as_py())
            px[i] = int(img[0, 0, 0]) if img is not None else -1
        return pa.table({
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "height": t.column("height").cast(pa.int64()),
            "width": t.column("width").cast(pa.int64()),
            "pixel_value": pa.array(px, pa.int64()),
        })

    return dims.map_batches(pixel, batch_format="pyarrow")


def _q_docs_as_mp4_frames(sf_dir: str):
    """Distributed MP4 FRAME SAMPLING with an exact oracle (round 5):
    each doc becomes a real ISO-BMFF file (``encode_mp4``) holding
    k = n_chars % 7 + 1 encoded samples whose bytes are pure
    arithmetic of (doc_id, frame index); ``FrameSample`` demuxes via
    the stsc/stsz/stco walk (chunk layout cycling doc_id % 3 + 1 so
    multi-sample chunk runs are exercised) and samples 3 frames
    evenly.  np.unique(linspace(0, k-1, min(3, k))) has the closed
    form {0} ∪ {(k-1)//2 | k≥3} ∪ {k-1 | k≥2}, so the oracle states
    the exact (frame_idx, first_byte, frame_len) set in SQL — a
    hash-match proves the demux returns the true sample boundaries,
    not approximate byte windows."""
    from dabloomray.stages.codecs import encode_mp4
    from dabloomray.stages.multimodal import FrameSample

    docs = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def synth(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        nc = t.column("n_chars").to_numpy()
        blobs = []
        for i in range(len(ids)):
            k = int(nc[i]) % 7 + 1
            frames = [bytes([int(ids[i] + j) % 251]) * (j % 5 + 2)
                      for j in range(k)]
            blobs.append(encode_mp4(frames, int(ids[i]) % 31 + 4,
                                    int(nc[i]) % 29 + 4,
                                    chunk_size=int(ids[i]) % 3 + 1))
        return pa.table({"media_id": pa.array(ids, pa.int64()),
                         "content": pa.array(blobs, pa.binary())})

    media = docs.map_batches(synth, batch_format="pyarrow")
    out = media.map_batches(FrameSample,
                            fn_constructor_kwargs={"n_frames": 3},
                            batch_format="pyarrow", concurrency=(1, 4))

    def finish(t: pa.Table) -> pa.Table:
        fb = np.empty(len(t), np.int64)
        fl = np.empty(len(t), np.int64)
        for i, b in enumerate(t.column("frame")):
            bs = b.as_py()
            fb[i] = bs[0] if bs else -1
            fl[i] = len(bs)
        return pa.table({
            "doc_id": t.column("media_id").cast(pa.int64()),
            "frame_idx": t.column("frame_idx").cast(pa.int64()),
            "first_byte": pa.array(fb, pa.int64()),
            "frame_len": pa.array(fl, pa.int64()),
        })

    return out.map_batches(finish, batch_format="pyarrow")


def _q_docs_hash_sample(sf_dir: str):
    """Deterministic hash-Bernoulli sample (SURVEY.md §2.6 sampling):
    keep docs with murmur64(text) below 20% of the hash space —
    reproducible across runs/parallelism, duplicates sampled together
    (rows-only: murmur64 has no DuckDB equivalent; determinism and the
    binomial bound are asserted in tests/test_sample.py)."""
    from dabloomray.stages.sample import sample_by_hash

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return sample_by_hash(docs, "text", 0.2).select_columns(["doc_id"])


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "dedup_documents_exact": _q_dedup_documents_exact,
        "docs_per_lang": _q_docs_per_lang,
        "membership_semijoin": _q_membership_semijoin,
        "distinct_users_hll": _q_distinct_users_hll,
        "event_type_freq_cms": _q_event_type_freq_cms,
        "value_quantiles_tdigest": _q_value_quantiles_tdigest,
        "nchars_quantiles_kll": _q_nchars_quantiles_kll,
        "docs_text_stats": _q_docs_text_stats,
        "docs_fingerprint_dedup": _q_docs_fingerprint_dedup,
        "embedding_neardup_pairs": _q_embedding_neardup_pairs,
        "knn_embeddings": _q_knn_embeddings,
        "minhash_dedup_pairs": _q_minhash_dedup_pairs,
        "simhash_dedup_pairs": _q_simhash_dedup_pairs,
        "simhash_pairs_exact": _q_simhash_pairs_exact,
        "knn_ivf_full": _q_knn_ivf_full,
        "lsh_pairs_exhaustive": _q_lsh_pairs_exhaustive,
        "scaling_remove_stream": _q_scaling_remove_stream,
        "nchars_quantiles_kll_exact": _q_nchars_quantiles_kll_exact,
        "value_quantiles_tdigest_exact": _q_value_quantiles_tdigest_exact,
        "lang_id_counts": _q_lang_id_counts,
        "source_counts_salted": _q_source_counts_salted,
        "events_hourly": _q_events_hourly,
        "top_users": _q_top_users,
        "near_dedup_keep_first": _q_near_dedup_keep_first,
        "knn_ivf": _q_knn_ivf,
        "docs_en_by_source": _q_docs_en_by_source,
        "pricing_summary": _q_pricing_summary,
        "user_sessions": _q_user_sessions,
        "distinct_langs": _q_distinct_langs,
        "top_value_events": _q_top_value_events,
        "top_event_types_sketch": _q_top_event_types_sketch,
        "orders_by_segment": _q_orders_by_segment,
        "purchase_after_signup": _q_purchase_after_signup,
        "supplier_by_nation": _q_supplier_by_nation,
        "customers_by_region": _q_customers_by_region,
        "docs_hash_sample": _q_docs_hash_sample,
        "docs_shingle_fingerprint": _q_docs_shingle_fingerprint,
        "docs_as_images_dims": _q_docs_as_images_dims,
        "docs_as_png_dims": _q_docs_as_png_dims,
        "docs_as_jpeg_decode": _q_docs_as_jpeg_decode,
        "docs_as_mp4_frames": _q_docs_as_mp4_frames,
        "near_dedup_threshold1": _q_near_dedup_threshold1,
        "big_purchasers_without_big_error": _q_big_purchasers_without_big_error,
        "big_purchasers_with_big_error": _q_big_purchasers_with_big_error,
    }


# Word-3-gram set Jaccard in pure SQL (DuckDB list kernels) — the
# shared core of the minhash-pair and keep-first oracles.  Gram
# construction mirrors dedup.word_ngrams for ASCII text: words split
# on Python str.split()'s ASCII whitespace class (\t \n \v \f \r
# \x1c-\x1f space — RE2's \s misses \x1c-\x1f, and edge tokens must
# be FILTERED, not kept empty, or 'a b\n' diverges from 'a b'),
# <3-word docs collapse to one whole-join gram, gram-less docs have
# no grams.  Non-ASCII whitespace (U+0085 etc.) is out of scope: the
# fixtures are ASCII (asserted where the alias tests read them).  The
# threshold predicate uses the same division form as the pipeline
# (double division of exact integers >= 0.8) so borderline doubles
# agree.
_JACCARD_GRAMS_CTE = (
    "w AS (SELECT doc_id, list_filter(regexp_split_to_array(text, "
    " '[\\t\\n\\x0B\\x0C\\r\\x1C-\\x1F ]+'), x -> x <> '') AS ws "
    " FROM documents), "
    "g AS (SELECT doc_id, CASE WHEN len(ws) = 0 THEN [] "
    " WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')] "
    " ELSE list_transform(generate_series(1, len(ws)-2), "
    "  i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) END AS grams "
    " FROM w), "
    "d AS (SELECT doc_id, list_distinct(grams) AS gs FROM g), "
    # shared-gram candidate generation — LOSSLESS: jaccard >= 0.8 > 0
    # requires at least one shared gram (and gram-less docs can never
    # pair in the pipeline either: no grams -> no bands).  Because gs
    # is already per-doc DISTINCT, COUNT(*) of gram matches per pair
    # IS |A∩B|, and |A∪B| = |A|+|B|-|A∩B| — no list kernels in the
    # pair loop, and the O(n^2) inequality self-join becomes a hash
    # join on gram (12.5M raw pairs -> ~3e5 candidates at sf0.1).
    "x AS (SELECT doc_id, unnest(gs) AS gram FROM d), "
    "sz AS (SELECT doc_id, len(gs) AS k FROM d), "
    "i AS (SELECT a.doc_id AS lid, b.doc_id AS rid, "
    "  CAST(COUNT(*) AS DOUBLE) AS inter "
    " FROM x a JOIN x b ON a.gram = b.gram AND a.doc_id < b.doc_id "
    " GROUP BY 1, 2), "
    # two pair sources: shared-gram candidates (jaccard > 0 needs a
    # shared gram), PLUS every pair of GRAM-LESS docs — the pipeline
    # pairs those at jaccard 1.0 (empty docs share the all-max minhash
    # signature, so they share every band bucket, and the both-empty
    # verify convention is 1.0), so the oracle must too
    "p AS (SELECT lid AS left_id, rid AS right_id, "
    " ROUND(inter / (ka.k + kb.k - inter), 6) AS jaccard "
    " FROM i JOIN sz ka ON ka.doc_id = lid JOIN sz kb ON kb.doc_id = rid "
    " WHERE inter / (ka.k + kb.k - inter) >= 0.8 "
    " UNION ALL "
    " SELECT a.doc_id, b.doc_id, 1.0 "
    " FROM sz a JOIN sz b ON a.doc_id < b.doc_id "
    " WHERE a.k = 0 AND b.k = 0)"
)

_JACCARD_PAIRS_SQL = (
    "WITH " + _JACCARD_GRAMS_CTE
    + " SELECT left_id, right_id, jaccard FROM p"
)

# keep-first = drop every doc whose transitive closure over the
# verified pair graph contains a smaller doc_id (recursive CTE).
_KEEP_FIRST_SQL = (
    "WITH RECURSIVE " + _JACCARD_GRAMS_CTE + ", "
    "e AS (SELECT left_id AS a, right_id AS b FROM p "
    " UNION ALL SELECT right_id, left_id FROM p), "
    "reach(node, other) AS ("
    " SELECT a, b FROM e "
    " UNION "
    " SELECT e.a, r.other FROM e JOIN reach r ON e.b = r.node "
    "  WHERE e.a <> r.other) "
    "SELECT doc_id FROM documents WHERE doc_id NOT IN "
    "(SELECT node FROM reach WHERE other < node)"
)

# Hazen midpoint-interpolation quantiles — the exact regime shared by
# BOTH quantile sketches: sorted v_1..v_n at cumulative positions
# i-0.5, target q*n, clamped to the extremes; unit-width segments
# make the interpolation arithmetic identical to numpy.interp's.
# KLL reaches this regime when k > n (no level-0 compaction, weights
# all 1); t-digest when compression > pi*n/2 (the k1 scale allows no
# centroid absorption anywhere, so every centroid stays a singleton).
def _hazen_quantile_sql(table: str, col: str, qs: list[float]) -> str:
    qvals = ", ".join(f"({q})" for q in qs)
    return (
        f"WITH s AS (SELECT CAST({col} AS DOUBLE) AS v, "
        f" ROW_NUMBER() OVER (ORDER BY {col}) AS i FROM {table}), "
        "meta AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM s), "
        f"qs(q) AS (VALUES {qvals}), "
        "pos AS (SELECT q, n, "
        " CAST(LEAST(GREATEST(FLOOR(q*n + 0.5), 1), n - 1) AS BIGINT) AS ilo "
        " FROM qs, meta) "
        "SELECT q, ROUND(CASE "
        " WHEN q*n <= 0.5 THEN (SELECT v FROM s WHERE i = 1) "
        " WHEN q*n >= n - 0.5 THEN "
        "  (SELECT v FROM s WHERE i = (SELECT CAST(n AS BIGINT) FROM meta)) "
        " ELSE lo.v + (q*n - (ilo - 0.5)) * (hi.v - lo.v) END, 6) "
        " AS value_est "
        # LEFT joins (ADVICE r3): for n <= 1 the interpolation rows
        # ilo/ilo+1 have no match, but the q*n<=0.5 / q*n>=n-0.5 CASE
        # branches (which never read lo/hi) must still see their row —
        # inner joins would eliminate it before the CASE evaluates
        "FROM pos LEFT JOIN s lo ON lo.i = pos.ilo "
        "LEFT JOIN s hi ON hi.i = pos.ilo + 1 ORDER BY q"
    )


_KLL_EXACT_SQL = _hazen_quantile_sql("documents", "n_chars",
                                     [0.25, 0.5, 0.75, 0.95])
_TDIGEST_EXACT_SQL = _hazen_quantile_sql("events", "value",
                                         [0.25, 0.5, 0.75, 0.95])


def oracle_sql() -> dict[str, str]:
    return {
        "dedup_documents_exact": (
            "SELECT MIN(doc_id) AS doc_id, text FROM documents GROUP BY text"
        ),
        "docs_per_lang": (
            "SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang"
        ),
        "membership_semijoin": (
            "SELECT l_returnflag, COUNT(*) AS n, "
            "ROUND(SUM(l_quantity), 2) AS sum_qty FROM lineitem "
            "WHERE l_orderkey IN (SELECT o_orderkey FROM orders "
            "WHERE o_totalprice > 200000.0) GROUP BY l_returnflag"
        ),
        "distinct_users_hll": (
            "SELECT COUNT(DISTINCT user_id) AS n_distinct FROM events"
        ),
        "event_type_freq_cms": (
            "SELECT event_type, COUNT(*) AS n FROM events "
            "GROUP BY event_type"
        ),
        "docs_text_stats": (
            r"SELECT doc_id, CASE WHEN trim(text)='' THEN 0 ELSE "
            r"len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens, "
            r"CAST(length(text) AS BIGINT) AS len_chars FROM documents"
        ),
        "docs_fingerprint_dedup": (
            "SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text"
        ),
        "embedding_neardup_pairs": (
            "SELECT a.vec_id AS left_id, b.vec_id AS right_id "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4"
        ),
        "knn_embeddings": (
            "SELECT query_id, neighbor_id FROM ("
            " SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,"
            "  ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY"
            "   list_cosine_similarity(a.embedding, b.embedding) DESC,"
            "   b.vec_id) AS rn"
            " FROM embeddings a JOIN embeddings b ON b.vec_id != a.vec_id"
            " WHERE a.vec_id < 5) WHERE rn <= 10"
        ),
        "source_counts_salted": (
            "SELECT source, COUNT(*) AS n FROM documents GROUP BY source"
        ),
        "events_hourly": (
            "SELECT event_type, CAST(floor(epoch(ts)/3600) AS BIGINT) AS "
            "window_id, COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value "
            "FROM events GROUP BY event_type, window_id"
        ),
        "top_users": (
            "SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id "
            "ORDER BY n DESC, user_id LIMIT 20"
        ),
        "docs_en_by_source": (
            "SELECT source, COUNT(*) AS n FROM documents "
            "WHERE lang = 'en' GROUP BY source"
        ),
        "pricing_summary": (
            "SELECT l_returnflag, l_linestatus, "
            "ROUND(SUM(l_quantity), 2) AS sum_qty, "
            "ROUND(SUM(l_extendedprice * (1 - l_discount)), 0) AS "
            "sum_disc_price, COUNT(*) AS count_order FROM lineitem "
            "GROUP BY l_returnflag, l_linestatus"
        ),
        "user_sessions": (
            "SELECT user_id, CAST(1 + SUM(CASE WHEN gap_us > "
            "30*60*1000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions, "
            "COUNT(*) AS n_events FROM ("
            " SELECT user_id, COALESCE(CAST(epoch_us(ts) - "
            "  LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts)"
            "  AS BIGINT), 0) AS gap_us FROM events) GROUP BY user_id"
        ),
        "distinct_langs": "SELECT DISTINCT lang FROM documents",
        "top_event_types_sketch": (
            "SELECT event_type, COUNT(*) AS n FROM events "
            "GROUP BY event_type ORDER BY n DESC, event_type LIMIT 5"
        ),
        "orders_by_segment": (
            "SELECT c_mktsegment, COUNT(*) AS n_orders, "
            "ROUND(SUM(o_totalprice), 0) AS total FROM orders "
            "JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment"
        ),
        "purchase_after_signup": (
            "SELECT p.event_id, MAX(s.ts) AS signup_ts FROM events p "
            "JOIN events s ON s.user_id = p.user_id "
            "AND s.event_type = 'signup' AND s.ts <= p.ts "
            "WHERE p.event_type = 'purchase' GROUP BY p.event_id"
        ),
        "top_value_events": (
            "SELECT event_id, value FROM events "
            "ORDER BY value DESC, event_id LIMIT 100"
        ),
        "supplier_by_nation": (
            "SELECT n_name, COUNT(*) AS n_suppliers, "
            "ROUND(SUM(s_acctbal), 2) AS total_bal FROM supplier "
            "JOIN nation ON s_nationkey = n_nationkey GROUP BY n_name"
        ),
        "customers_by_region": (
            "SELECT r_name, COUNT(*) AS n_customers FROM customer "
            "JOIN nation ON c_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name"
        ),
        "big_purchasers_without_big_error": (
            "SELECT DISTINCT user_id FROM events "
            "WHERE event_type = 'purchase' AND value > 150 AND "
            "user_id NOT IN (SELECT user_id FROM events "
            "WHERE event_type = 'error' AND value > 150)"
        ),
        "near_dedup_threshold1": (
            "SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text"
        ),
        "big_purchasers_with_big_error": (
            "SELECT DISTINCT user_id FROM events "
            "WHERE event_type = 'purchase' AND value > 150 AND "
            "user_id IN (SELECT user_id FROM events "
            "WHERE event_type = 'error' AND value > 150)"
        ),
        "minhash_dedup_pairs": _JACCARD_PAIRS_SQL,
        "near_dedup_keep_first": _KEEP_FIRST_SQL,
        "simhash_pairs_exact": (
            "SELECT a.doc_id AS left_id, b.doc_id AS right_id "
            "FROM documents a JOIN documents b "
            "ON a.text = b.text AND a.doc_id < b.doc_id"
        ),
        "knn_ivf_full": (
            "SELECT query_id, neighbor_id FROM ("
            " SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,"
            "  ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY"
            "   list_cosine_similarity(a.embedding, b.embedding) DESC,"
            "   b.vec_id) AS rn"
            " FROM embeddings a JOIN embeddings b ON b.vec_id != a.vec_id"
            " WHERE a.vec_id < 5) WHERE rn <= 10"
        ),
        "lsh_pairs_exhaustive": (
            "SELECT a.vec_id AS left_id, b.vec_id AS right_id "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4"
        ),
        "nchars_quantiles_kll_exact": _KLL_EXACT_SQL,
        "value_quantiles_tdigest_exact": _TDIGEST_EXACT_SQL,
        "docs_as_images_dims": (
            "SELECT doc_id, n_chars % 29 + 4 AS height, "
            "doc_id % 31 + 4 AS width FROM documents"
        ),
        "docs_as_png_dims": (
            "SELECT doc_id, n_chars % 29 + 4 AS height, "
            "doc_id % 31 + 4 AS width FROM documents"
        ),
        "docs_as_jpeg_decode": (
            "SELECT doc_id, n_chars % 29 + 4 AS height, "
            "doc_id % 31 + 4 AS width, doc_id % 199 + 17 AS pixel_value "
            "FROM documents"
        ),
        # closed form of np.unique(linspace(0, k-1, min(3, k))):
        # {0} ∪ {(k-1)//2 | k>=3} ∪ {k-1 | k>=2}; frame bytes are
        # arithmetic of (doc_id, source frame idx)
        "docs_as_mp4_frames": (
            "WITH d AS (SELECT doc_id, n_chars % 7 + 1 AS k "
            "           FROM documents), "
            "i AS (SELECT doc_id, 0 AS frame_idx FROM d "
            "      UNION "
            "      SELECT doc_id, (k - 1) // 2 FROM d WHERE k >= 3 "
            "      UNION "
            "      SELECT doc_id, k - 1 FROM d WHERE k >= 2) "
            "SELECT doc_id, frame_idx, "
            "       (doc_id + frame_idx) % 251 AS first_byte, "
            "       frame_idx % 5 + 2 AS frame_len "
            "FROM i"
        ),
        # value_quantiles_tdigest / nchars_quantiles_kll /
        # simhash_dedup_pairs / lang_id_counts / scaling_remove_stream:
        # approximate or heuristic — intentionally no SQL oracle
        # (rows-only check); bounds and brute-force parity asserted in
        # tests/, and each has an exact-regime or degenerate sibling
        # above that IS hash-checked (tdigest_exact, kll_exact,
        # simhash_pairs_exact).
    }
