"""rolling_fingerprint_shingles vs a pure-Python Rabin-Karp twin —
including texts where the minimum window hash is NOT the first window
(the round-2 review found the old code hashed only the first window)."""

import re

import pytest

from pbf2json_spark.operators.textops import (ROLL_BASE, ROLL_MOD,
                                              rolling_fingerprint_shingles)


def _py_rolling_min(text: str, window: int = 16) -> int:
    t = re.sub(r"\s+", " ", text.lower())
    codes = [ord(c) for c in t]
    h = 0
    for c in codes[:window]:
        h = (h * ROLL_BASE + c) % ROLL_MOD
    if len(codes) <= window:
        return h
    pw = pow(ROLL_BASE, window - 1, ROLL_MOD)
    mn = h
    for i in range(window, len(codes)):
        h = ((h - codes[i - window] * pw) % ROLL_MOD * ROLL_BASE
             + codes[i]) % ROLL_MOD
        mn = min(mn, h)
    return mn


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "zzzzzzzzzzzzzzzzzzzz and then an aaaaaaaaaaaaaaaa tail",  # min late
    "short",                                                   # < window
    "exactly sixteen!",                                        # == window
    "  Mixed   CASE \t with\nwhitespace   runs  ",
    "a" * 200 + "!" + "b" * 200,
]


@pytest.mark.parametrize("window", [8, 16])
def test_rolling_fp_matches_python_twin(spark, window):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string")
    got = {r.doc_id: r.rolling_fp
           for r in rolling_fingerprint_shingles(df, window=window).collect()}
    for i, t in enumerate(TEXTS):
        assert got[i] == _py_rolling_min(t, window), (i, t)


def test_rolling_fp_min_is_not_first_window(spark):
    """Pin that the slide actually happens: a text constructed so the
    first window has a LARGE hash and a later window a smaller one."""
    text = "zzzzzzzzzzzzzzzzzzzz then aaaaaaaaaaaaaaaaaaaa"
    window = 16
    t = re.sub(r"\s+", " ", text.lower())
    codes = [ord(c) for c in t]
    first = 0
    for c in codes[:window]:
        first = (first * ROLL_BASE + c) % ROLL_MOD
    assert _py_rolling_min(text, window) != first  # twin itself slides
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    got = rolling_fingerprint_shingles(df, window=window).collect()[0]
    assert got.rolling_fp == _py_rolling_min(text, window)
    assert got.rolling_fp != first
