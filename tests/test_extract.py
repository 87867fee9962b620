"""Byte-identical text extraction (SURVEY.md §5.2(6), BASELINE.json
input_hint invariant)."""

import pyarrow as pa

from dabloomray.extract import extract_text, extract_text_batch
from dabloomray.fixtures import make_urls_table

GOLDEN = [
    (b"<html><head><title>T1</title></head><body><p>hello world</p></body></html>",
     "T1\nhello world"),
    (b"<html><body><p>a</p><p>b</p></body></html>", "a b"),
    (b"no tags at all", "no tags at all"),
    (b"<body>  spaced   out  </body>", "spaced out"),
    (b"", ""),
]


def test_golden_outputs():
    for html, want in GOLDEN:
        assert extract_text(html) == want


def test_fixture_text_column_is_extractor_output():
    """F1 invariant: the corpus text column == extract_text(html) —
    byte-identical per url."""
    t = make_urls_table(300)
    htmls = t.column("html").to_pylist()
    texts = t.column("text").to_pylist()
    for h, x in zip(htmls, texts):
        assert extract_text(h) == x


def test_fast_path_equals_scalar_on_adversarial_inputs():
    """The vectorized fast path must be byte-identical to the scalar
    extractor on every input class: ascii happy path, unicode,
    invalid utf-8, odd whitespace, missing tags, empty parts."""
    cases = [
        b"<html><head><title>T</title></head><body><p>a b</p></body></html>",
        b"<TITLE>upper</TITLE><BODY>x</BODY>",
        b"<title>only title</title>",
        b"<body>only body</body>",
        b"no tags here at all",
        b"",
        b"<title>  </title><body> \t\n </body>",      # whitespace-only parts
        b"<title>a\x0bb</title><body>c\x1cd</body>",  # \v and \x1c ws
        "<title>café</title><body>unicode</body>".encode(),
        b"<title>bad \xff utf8</title><body>x</body>",  # invalid utf-8
        b"<body><div><span>nested</span> <b>tags</b></div></body>",
        b"<title>multi</title><body>first</body><body>second</body>",
        b"<body attr='<'>tricky</body>",
        b"\x0c<title>form feed</title>",
    ]
    t = pa.table({"html": pa.array(cases, pa.binary())})
    got = extract_text_batch(t).column("text").to_pylist()
    want = [extract_text(h) for h in cases]
    assert got == want


def test_batch_stage_matches_scalar_and_is_deterministic():
    t = make_urls_table(200)
    out1 = extract_text_batch(t.drop_columns(["text"]))
    out2 = extract_text_batch(t.drop_columns(["text"]))
    assert out1.column("text").to_pylist() == out2.column("text").to_pylist()
    assert out1.column("text").to_pylist() == t.column("text").to_pylist()


def test_unicode_nfc():
    # decomposed e + combining acute must normalize to composed é
    html = "<body>café</body>".encode()
    assert extract_text(html) == "café"
