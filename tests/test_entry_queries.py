"""Driver-contract queries vs DuckDB oracles (SURVEY.md §5.2(7)).

The exact queries are also compared by the driver; here we additionally
assert the approximate (rows-only) queries stay within their published
bounds against exact DuckDB answers.
"""

import sys

import duckdb
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def entrymod(ray_session):
    import __ray_entry__ as e

    return e


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["orders", "lineitem", "events", "documents", "embeddings",
              "customer", "supplier", "nation", "region"]:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def test_entry_runs_and_is_deterministic(entrymod):
    a = entrymod.entry().to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = entrymod.entry().to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(a) > 0
    assert a.equals(b)


def test_every_oracle_key_has_a_query(entrymod):
    qs = entrymod.queries()
    for name in entrymod.oracle_sql():
        assert name in qs


def test_exact_queries_match_oracle(entrymod, con):
    import pandas as pd

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    for name, sql in oracles.items():
        got = qs[name](SF)
        got = got.to_pandas() if hasattr(got, "to_pandas") else got
        want = con.sql(sql).df()
        got = got[sorted(got.columns)].sort_values(
            by=sorted(got.columns)).reset_index(drop=True)
        want = want[sorted(want.columns)].sort_values(
            by=sorted(want.columns)).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
def test_fixture_has_no_shingle_aliases(sf):
    """Oracle-equivalence precondition for near_dedup_threshold1
    (ADVICE r2): its GROUP BY text oracle is the pipeline's
    equivalence only if no two DISTINCT texts share a word-3-gram
    shingle SET (texts differing only in whitespace runs, or distinct
    <3-word texts with equal joins, would merge in the pipeline but
    not in SQL).  Holds at every sf."""
    import duckdb as dk

    from dabloomray.pipelines.dedup import word_ngrams

    texts = dk.sql(
        f"SELECT DISTINCT text FROM '/root/testdata/{sf}/documents.parquet'"
    ).df()["text"].tolist()
    seen3: dict[frozenset, str] = {}
    for t in texts:
        key = frozenset(word_ngrams(t, 3))
        assert key not in seen3, (
            f"distinct texts share a 3-gram shingle set in {sf}: "
            f"{seen3[key]!r} vs {t!r}")
        seen3[key] = t


def test_fixture_simhash_aliases_documented():
    """Documentation of WHY simhash_pairs_exact needs its exact
    text-equality verify stage: at sf0.1 the fixture genuinely
    contains signature collisions between DISTINCT word-salad texts
    (the ~25-word vocabulary makes coinciding bit votes likely at 5k
    docs — verified: distinct word sequences AND distinct 2-gram
    sets, same 64-bit signature).  The raw max_hamming=0 gate alone
    would over-report pairs there; the verify makes the query exact
    at every sf.  At sf0.001/sf0.01 signatures are injective (the
    gate alone would already be exact)."""
    import duckdb as dk

    from dabloomray.pipelines.dedup import simhash64

    counts = {}
    for sf in ["sf0.001", "sf0.01", "sf0.1"]:
        texts = dk.sql(
            "SELECT DISTINCT text FROM "
            f"'/root/testdata/{sf}/documents.parquet'"
        ).df()["text"].tolist()
        sh = simhash64(texts, ngram=2)
        counts[sf] = len(texts) - len(np.unique(sh))
    assert counts["sf0.001"] == 0 and counts["sf0.01"] == 0, counts
    # sf0.1's aliases are a fixture property, not a bug — if the
    # fixture ever changes this documents the then-current state
    assert counts["sf0.1"] >= 0


def test_scaling_remove_stream_semantics(entrymod):
    """The distributed add/remove stream query (G2+G3 via op_col
    routing, the pydablooms suite pattern): every RETAINED key (added,
    never removed) must report member=True — the zero-false-negative
    guarantee survives interleaved removes — while removed keys (every
    4th) mostly report False (a removed key may still hit only at the
    false-positive rate; bound it loosely at 2x the configured 0.05).
    Deterministic for the fixed fixture (asserted by running twice)."""
    out = entrymod.queries()["scaling_remove_stream"](SF).to_pandas()
    retained = out[out["event_id"] % 4 != 0]
    removed = out[out["event_id"] % 4 == 0]
    assert len(retained) and len(removed)
    assert retained["member"].all(), "false negative on a retained key"
    fpr = removed["member"].mean()
    assert fpr <= 0.10, f"removed-key hit rate {fpr:.4f} above bound"
    again = entrymod.queries()["scaling_remove_stream"](SF).to_pandas()
    assert out.sort_values("event_id").reset_index(drop=True).equals(
        again.sort_values("event_id").reset_index(drop=True))


def test_tdigest_exact_regime_is_singleton(con):
    """Pin the premise of value_quantiles_tdigest_exact's oracle: at
    compression 10^6 > pi*n/2 the k1 scale function admits NO
    absorption, so after compress every centroid is a weight-1
    singleton and quantile() is exactly Hazen interpolation."""
    from dabloomray.sketches.tdigest import TDigest

    vals = con.sql("SELECT value FROM events").df()["value"].to_numpy()
    td = TDigest(1_000_000)
    td.add(vals)
    td._flush()
    assert len(td.means) == len(vals)
    assert (td.weights == 1.0).all()


def test_tdigest_quantiles_within_rank_bound(entrymod, con):
    out = entrymod.queries()["value_quantiles_tdigest"](SF).to_pandas()
    values = con.sql("SELECT value FROM events").df()["value"].to_numpy()
    s = np.sort(values)
    for q, est in zip(out["q"], out["value_est"]):
        rank = np.searchsorted(s, est) / len(s)
        assert abs(rank - q) < 0.02, (q, est, rank)


def test_kll_quantiles_within_rank_bound(entrymod, con):
    out = entrymod.queries()["nchars_quantiles_kll"](SF).to_pandas()
    values = con.sql("SELECT n_chars FROM documents").df()["n_chars"].to_numpy()
    s = np.sort(values)
    for q, est in zip(out["q"], out["value_est"]):
        rank = np.searchsorted(s, est) / len(s)
        # 500-row table: one row = 0.2% rank; allow a few rows of slack
        assert abs(rank - q) <= 0.05, (q, est, rank)
