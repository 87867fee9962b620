"""pydablooms-surface shim: mirrors pydablooms/test_pydablooms.py ≈L1–95
(add i%2==0 with id=i, delete i%4==0, check all; zero false negatives,
FPR <= bound; reopen round-trip)."""

import pytest

from dabloomray.compat import Dablooms, load_dablooms
from dabloomray.fixtures import make_words

CAPACITY = 5000
ERROR_RATE = 0.05


@pytest.fixture(scope="module")
def words():
    return make_words(12_000).column("word").to_pylist()


def test_reference_suite_through_shim(tmp_path, words):
    path = str(tmp_path / "bloom.parquet")
    bloom = Dablooms(CAPACITY, ERROR_RATE, path)
    # add evens (vectorized batch — same semantics as scalar loop)
    ids = list(range(len(words)))
    bloom.add_batch(words[0::2], ids[0::2])
    bloom.delete_batch(words[0::4], ids[0::4])
    assert bloom.mem_seqnum == len(words[0::2]) + len(words[0::4])
    assert bloom.disk_seqnum == 0
    bloom.flush()
    assert bloom.disk_seqnum == bloom.mem_seqnum

    kept = [w for i, w in enumerate(words) if i % 2 == 0 and i % 4 != 0]
    never = words[1::2]
    verdicts = bloom.check_batch(kept)
    assert verdicts.all(), "false negative through the shim"
    fpr = bloom.check_batch(never).mean()
    assert fpr <= ERROR_RATE

    # reopen round-trip: identical verdicts
    re = load_dablooms(CAPACITY, ERROR_RATE, path)
    assert re.check_batch(kept).all()
    assert re.check_batch(never).mean() == fpr
    assert re.mem_seqnum == bloom.mem_seqnum


def test_scalar_api_and_contains(tmp_path):
    bloom = Dablooms(100, 0.05, str(tmp_path / "b.parquet"))
    assert bloom.add("hello", 1)
    assert bloom.check("hello")
    assert "hello" in bloom
    assert b"hello" in bloom  # bytes keys accepted
    assert bloom.delete("hello", 1)
    assert not bloom.check("hello")
    # delete with an id older than the chain start is not routed
    bloom2 = Dablooms(100, 0.05, str(tmp_path / "b2.parquet"))
    bloom2._bloom.blooms[0].first_id = 10
    assert not bloom2.delete("x", 5)


def test_chain_growth_through_shim(tmp_path):
    bloom = Dablooms(500, 0.05, str(tmp_path / "g.parquet"))
    keys = [f"k{i}" for i in range(1800)]
    bloom.add_batch(keys, list(range(1800)))
    assert len(bloom._bloom.blooms) >= 2  # scaled across capacity
    assert bloom.check_batch(keys).all()
    bloom.flush()
    re = load_dablooms(500, 0.05, str(tmp_path / "g.parquet"))
    assert len(re._bloom.blooms) == len(bloom._bloom.blooms)
    assert re.check_batch(keys).all()
