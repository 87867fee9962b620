"""Near-dup pipelines vs brute-force oracles (MinHash-LSH, SimHash)."""

import itertools

import numpy as np
import pyarrow as pa
import pytest

from dabloomray.pipelines.dedup import (
    jaccard,
    minhash_lsh_dedup,
    minhash_signatures,
    simhash64,
    simhash_dedup,
    word_ngrams,
)


def corpus():
    base = ("the quick brown fox jumps over the lazy dog near the river "
            "bank while the sun sets slowly behind the old stone bridge")
    docs = {
        0: base,
        1: base,  # exact dup of 0
        2: base.replace("quick", "swift").replace("lazy", "sleepy"),  # near
        3: "completely different text about database engines and bloom "
           "filters running on distributed clusters with arrow batches",
        4: base.replace("the", "a"),  # moderate overlap
        5: "tiny doc",
    }
    return docs


def test_minhash_estimates_jaccard():
    docs = corpus()
    sig = minhash_signatures([docs[0], docs[2], docs[3]], num_perm=256)
    est02 = (sig[0] == sig[1]).mean()
    true02 = jaccard(docs[0], docs[2])
    assert abs(est02 - true02) < 0.15
    est03 = (sig[0] == sig[2]).mean()
    assert est03 < 0.1  # unrelated docs


def test_minhash_signature_deterministic_and_batch_invariant():
    docs = list(corpus().values())
    a = minhash_signatures(docs, num_perm=64)
    b = np.vstack([minhash_signatures([d], num_perm=64) for d in docs])
    assert np.array_equal(a, b)


def test_minhash_empty_and_short_docs():
    sig = minhash_signatures(["", "one two", ""], num_perm=32)
    assert (sig[0] == np.iinfo(np.uint64).max).all()
    assert (sig[2] == np.iinfo(np.uint64).max).all()
    assert not (sig[1] == np.iinfo(np.uint64).max).all()


def brute_force_pairs(docs, threshold, ngram=3):
    out = set()
    for a, b in itertools.combinations(sorted(docs), 2):
        if jaccard(docs[a], docs[b], ngram) >= threshold:
            out.add((a, b))
    return out


def test_minhash_lsh_pipeline_matches_bruteforce(ray_session):
    import ray.data as rd

    docs = corpus()
    ds = rd.from_items(
        [{"doc_id": k, "text": v} for k, v in docs.items()]
    ).repartition(3)
    out = minhash_lsh_dedup(ds, "doc_id", "text", threshold=0.5,
                            num_perm=128, bands=32)
    got = {(r["left_id"], r["right_id"]) for r in out.take_all()}
    want = brute_force_pairs(docs, 0.5)
    # LSH at J>=0.5 with b=32,r=4: detection prob ~1-(1-0.5^4)^32 = 0.87;
    # our fixed corpus pairs are all comfortably above/below threshold
    assert got == want


def test_simhash_near_dup_detection(ray_session):
    import ray.data as rd

    docs = corpus()
    ds = rd.from_items(
        [{"doc_id": k, "text": v} for k, v in docs.items()]
    ).repartition(2)
    out = simhash_dedup(ds, "doc_id", "text", max_hamming=3).take_all()
    got = {(r["left_id"], r["right_id"]) for r in out}
    assert (0, 1) in got  # exact dups: hamming 0
    # brute-force: every returned pair really is within the bound
    sh = simhash64([docs[k] for k in sorted(docs)])
    for l, r in got:
        assert bin(int(sh[l]) ^ int(sh[r])).count("1") <= 3
    # unrelated pair absent
    assert (0, 3) not in got


def test_word_ngrams_edges():
    assert word_ngrams("", 3) == []
    assert word_ngrams("a b", 3) == ["a b"]
    assert word_ngrams("a b c d", 3) == ["a b c", "b c d"]
