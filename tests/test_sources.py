"""Corpus source: schema validation + reads."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dabloomray.fixtures import make_urls_table
from dabloomray.sources.corpus import (
    read_corpus,
    read_text_corpus,
    validate_corpus_schema,
)


@pytest.fixture(scope="module")
def corpus_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("src") / "c.parquet"
    pq.write_table(make_urls_table(100), str(p))
    return str(p)


def test_validate_ok(corpus_file):
    validate_corpus_schema(corpus_file)
    validate_corpus_schema(corpus_file, required=["url", "html"])


def test_validate_missing_column(tmp_path):
    p = str(tmp_path / "bad.parquet")
    pq.write_table(pa.table({"url": pa.array(["a"], pa.string())}), p)
    with pytest.raises(ValueError, match="missing column"):
        validate_corpus_schema(p, required=["url", "warc_ts"])
    validate_corpus_schema(p, required=["url"])  # subset ok


def test_validate_wrong_type(tmp_path):
    p = str(tmp_path / "bad2.parquet")
    pq.write_table(pa.table({"url": pa.array([1], pa.int64())}), p)
    with pytest.raises(ValueError, match="has type"):
        validate_corpus_schema(p, required=["url"])


def test_read_corpus_prunes(ray_session, corpus_file):
    ds = read_corpus(corpus_file, columns=["url", "lang"])
    assert set(ds.schema().names) == {"url", "lang"}
    assert ds.count() == 100


def test_read_text_corpus(ray_session, tmp_path):
    p = str(tmp_path / "words.txt")
    open(p, "w").write("alpha\nbeta\ngamma\n")
    ds = read_text_corpus(p)
    assert sorted(r["word"] for r in ds.take_all()) == \
        ["alpha", "beta", "gamma"]
