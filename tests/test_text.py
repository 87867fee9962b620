"""Text-analysis stages (token count, quality, lang-id, fingerprint)."""

import numpy as np
import pyarrow as pa

from dabloomray.stages.text import (
    LangId,
    QualityScore,
    RegexTokenCount,
    fingerprint,
    rolling_shingle_min,
    token_count_whitespace,
)


def tbl(texts):
    return pa.table({"doc_id": list(range(len(texts))),
                     "text": pa.array(texts, pa.string())})


def test_token_count_whitespace():
    out = token_count_whitespace(tbl(["a b c", "", "  x ", "one"]))
    assert out.column("n_tokens").to_pylist() == [3, 0, 1, 1]


def test_regex_token_count():
    out = RegexTokenCount()(tbl(["hello, world! 42", ""]))
    # hello , world ! 42 → 5
    assert out.column("n_tokens_re").to_pylist() == [5, 0]


def test_quality_score_ranges():
    texts = [
        "the cat sat on the mat and it was a good day for the cat",
        "!!!! #### $$$$ %%%%",
        "",
        "word " * 100,
    ]
    out = QualityScore()(tbl(texts))
    scores = out.column("q_score").to_pylist()
    assert all(0.0 <= s <= 1.0 for s in scores)
    assert scores[0] > scores[1]  # prose beats punctuation soup
    assert out.column("q_punct_ratio").to_pylist()[1] > 0.5
    assert out.column("q_stop_ratio").to_pylist()[0] > 0.3


def test_lang_id_heuristic():
    out = LangId()(tbl([
        "the quick brown fox jumps over the lazy dog and the end",
        "la casa de la abuela está en el centro de la ciudad",
        "der hund und die katze sind in der schule mit dem kind",
        "汉字漢字汉字漢字汉字漢字汉字漢字",
        "zzzz qqqq",
    ]))
    preds = out.column("lang_pred").to_pylist()
    assert preds[0] == "en"
    assert preds[1] == "es"
    assert preds[3] == "zh"
    assert preds[4] == "und"


def test_fingerprint_stable_and_distinct():
    out1 = fingerprint(tbl(["abc", "abd", "abc"]))
    out2 = fingerprint(tbl(["abc", "abd", "abc"]))
    fps = out1.column("fp").to_pylist()
    assert fps == out2.column("fp").to_pylist()
    assert fps[0] == fps[2] != fps[1]
    assert len(fps[0]) == 32  # 128-bit hex


def test_rolling_shingle_min_deterministic():
    a = rolling_shingle_min("the quick brown fox jumps over the lazy dog")
    b = rolling_shingle_min("the quick brown fox jumps over the lazy dog")
    assert a == b
    # shared long substring keeps the min with high probability
    c = rolling_shingle_min("PREFIX the quick brown fox jumps over the lazy dog")
    assert isinstance(c, int)
    assert rolling_shingle_min("short") != rolling_shingle_min("shorx")


def test_quality_score_fast_path_parity():
    """ASCII numpy byte-table path == Arrow regex path, column for
    column, on edges (empty/punct-only/trailing-empty) and fuzz."""
    import random
    import string

    import dabloomray.stages.text as T

    qs = T.QualityScore()

    def slow(batch):
        real = T.pc.all
        T.pc.all = lambda *a, **k: pa.scalar(False)  # force Arrow path
        try:
            return T.QualityScore.__call__(qs, batch)
        finally:
            T.pc.all = real

    rng = random.Random(7)
    fuzz = ["".join(rng.choice(string.printable[:95])
                    for _ in range(rng.randrange(0, 120)))
            for _ in range(400)]
    cases = ["", "   ", "abc", "a!b?c", "...", None, "word the and", ""]
    for texts in (cases, fuzz):
        tab = pa.table({"text": pa.array(texts, pa.string())})
        f, s = qs(tab), slow(tab)
        for col in ("q_chars", "q_mean_word_len", "q_punct_ratio",
                    "q_stop_ratio", "q_score"):
            assert np.allclose(f.column(col).to_numpy(),
                               s.column(col).to_numpy()), col
    # non-ASCII rows take the fallback (no crash, sane outputs)
    uni = pa.table({"text": pa.array(["héllo wörld", "中文 text", "ok"])})
    out = qs(uni)
    assert out.column("q_chars").to_pylist()[0] == len("héllo wörld")


def test_token_count_fast_path_parity():
    import pyarrow.compute as pc

    from dabloomray.stages.text import token_count_whitespace

    texts = ["", " ", "one", "one two  three", "\ttab\nnl ", None, "x", ""]
    tab = pa.table({"text": pa.array(texts, pa.string())})
    got = token_count_whitespace(tab).column("n_tokens").to_pylist()
    want = pc.count_substring_regex(
        pc.fill_null(tab.column("text"), ""), r"\S+").cast("int64").to_pylist()
    assert got == want
    # sliced + non-ascii fallback agree too
    uni = pa.table({"text": pa.array(["héllo wörld", "a b"])})
    assert token_count_whitespace(uni).column("n_tokens").to_pylist() == [2, 2]


def test_langid_vectorized_parity():
    """Vectorized LangId == the per-row _classify reference."""
    from dabloomray.stages.text import LangId

    li = LangId()
    texts = [
        "the cat and the dog sat on the mat with the hat",
        "la casa de la playa es de los padres",
        "le chat de la maison est sur le tapis",
        "der hund und die katze sind in der küche",
        "中文文本的例子这里有很多汉字组成的句子",
        "zzz qqq xxx", "", None, "short",
    ]
    tab = pa.table({"text": pa.array(texts, pa.string())})
    got = li(tab).column("lang_pred").to_pylist()
    want = [li._classify(t) for t in texts]
    assert got == want


def test_rolling_fingerprint_vectorized_parity():
    """RollingFingerprint (byte-pair-table Karp-Rabin, 4.9x) ==
    rolling_shingle_min per doc, incl. short/empty/null/unicode rows
    and rows adjacent in the flat buffer (window-crossing guard)."""
    import random

    from dabloomray.stages.text import RollingFingerprint, rolling_shingle_min

    rng = random.Random(17)
    texts = ["".join(rng.choice("abcdef gh.!") for _ in range(rng.randrange(0, 80)))
             for _ in range(500)]
    texts += ["", "short", "x" * 15, "x" * 16, "x" * 17, None,
              "héllo wörld sixteen+ chars here", "a" * 200]
    tab = pa.table({"text": pa.array(texts, pa.string())})
    rf = RollingFingerprint(w=16)
    got = rf(tab).column("shingle_min").to_numpy().view(np.uint64)
    want = np.array([rolling_shingle_min(t or "", 16) for t in texts],
                    dtype=np.uint64)
    assert np.array_equal(got, want)
    # identical docs → identical fingerprints (the dedup use)
    dup = pa.table({"text": pa.array(["same doc text here okay!"] * 3)})
    vals = set(rf(dup).column("shingle_min").to_pylist())
    assert len(vals) == 1
