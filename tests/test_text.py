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
