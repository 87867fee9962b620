"""Scaling bloom semantics — reference suite replica (SURVEY.md §5.2(2))."""

import numpy as np
import pytest

from dabloomray.params import ScalingPolicy
from dabloomray.fixtures import make_words
from dabloomray.sketches.scaling import ScalingBloom
from dabloomray.serde import sketch_from_row, sketch_to_row


@pytest.fixture(scope="module")
def words_50k():
    t = make_words(50_000)
    return t.column("word").to_pylist(), t.column("seq_id").to_numpy()


def reference_pattern(sb: ScalingBloom, words, ids):
    """pydablooms/test_pydablooms.py ≈L40: add i%2==0 with id=i, remove
    i%4==0, then check all."""
    even = ids % 2 == 0
    fourth = ids % 4 == 0
    w = np.asarray(words, dtype=object)
    sb.add(list(w[even]), ids[even])
    sb.remove(list(w[fourth]), ids[fourth])
    kept = even & ~fourth
    never = ~even
    verdict = sb.check(words)
    return verdict, kept, never


def test_reference_suite_with_growth(words_50k):
    """Capacity 2000 << 25k adds forces many capacity boundaries
    (test_scaling_accuracy, src/test_dablooms.c ≈L300)."""
    words, ids = words_50k
    sb = ScalingBloom(ScalingPolicy(capacity0=2_000, target_error=0.05))
    verdict, kept, never = reference_pattern(sb, words, ids)
    assert len(sb.blooms) > 2  # chain actually grew
    fn = int((kept & ~verdict).sum())
    assert fn == 0, f"{fn} false negatives"
    fpr = float(verdict[never].mean())
    assert fpr <= 0.05, f"FPR {fpr}"


def test_reference_suite_no_growth(words_50k):
    words, ids = words_50k
    sb = ScalingBloom(ScalingPolicy(capacity0=100_000, target_error=0.05))
    verdict, kept, never = reference_pattern(sb, words, ids)
    assert len(sb.blooms) == 1
    assert int((kept & ~verdict).sum()) == 0
    assert float(verdict[never].mean()) <= 0.05


def test_growth_boundaries_batch_equals_rowwise():
    """Distributed parity: one big batch add == row-at-a-time adds
    (same sub-filter boundaries, same counters) — §5.2(4)."""
    words = [f"k{i:06d}" for i in range(7000)]
    ids = np.arange(7000, dtype=np.int64)
    a = ScalingBloom(ScalingPolicy(capacity0=1000, target_error=0.05))
    a.add(words, ids)
    b = ScalingBloom(ScalingPolicy(capacity0=1000, target_error=0.05))
    for i, w in enumerate(words):
        b.add([w], ids[i : i + 1])
    assert len(a.blooms) == len(b.blooms)
    for x, y in zip(a.blooms, b.blooms):
        assert x.first_id == y.first_id
        assert x.count == y.count
        assert np.array_equal(x.counters, y.counters)
    assert a.max_id == b.max_id == 6999


def test_remove_routes_to_covering_subfilter():
    """G3: remove decrements only the newest filter with first_id <= id;
    ids older than the chain return not-routed."""
    sb = ScalingBloom(ScalingPolicy(capacity0=1000, target_error=0.05))
    words = [f"k{i:06d}" for i in range(3000)]
    ids = np.arange(1, 3001, dtype=np.int64)
    sb.add(words, ids)
    assert len(sb.blooms) >= 2
    # remove a key from the first sub-filter's range using its insert id
    routed = sb.remove([words[10]], [ids[10]])
    assert routed.all()
    assert not sb.check([words[10]])[0] or True  # may still collide; no FN rule below
    # id 0 predates the chain only if first_id > 0; chain starts at 0 → routed
    routed = sb.remove(["neverseen"], [0])
    assert routed.all()
    # simulate a chain whose oldest filter starts later
    sb2 = ScalingBloom(ScalingPolicy(capacity0=100, target_error=0.05))
    sb2.blooms[0].first_id = 50
    routed = sb2.remove(["x"], [10])
    assert not routed.any()


def test_seqnum_protocol():
    sb = ScalingBloom(ScalingPolicy(capacity0=1000, target_error=0.05))
    sb.add(["a", "b", "c"], [1, 2, 3])
    assert sb.mem_seqnum == 3
    sb.remove(["a"], [1])
    assert sb.mem_seqnum == 4


def test_serde_roundtrip_preserves_verdicts(words_50k):
    words, ids = words_50k
    words, ids = words[:10_000], ids[:10_000]
    sb = ScalingBloom(ScalingPolicy(capacity0=2_000, target_error=0.05))
    verdict, kept, never = reference_pattern(sb, words, ids)
    row = sketch_to_row(sb, part_id=0)
    back = sketch_from_row(row)
    assert back.max_id == sb.max_id
    assert back.mem_seqnum == sb.mem_seqnum
    assert len(back.blooms) == len(sb.blooms)
    assert np.array_equal(back.check(words), verdict)  # reopen round-trip
