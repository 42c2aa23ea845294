"""Generality tests for the positional phrase-search operator
(plans/textops.py: phrase_search) beyond the catalog query's
distinct-word phrase: repeated phrase words, overlapping occurrences,
boundary starts — each checked against a brute-force Python scan."""

from __future__ import annotations

import pytest

from rag_application_with_vectordb_spark.plans.textops import phrase_search


def _reference(texts: dict[int, str], phrase: list[str]) -> dict[int, tuple[int, int]]:
    out = {}
    for doc_id, text in texts.items():
        toks = text.split()
        starts = [
            s
            for s in range(len(toks) - len(phrase) + 1)
            if toks[s : s + len(phrase)] == phrase
        ]
        if starts:
            out[doc_id] = (len(starts), starts[0])
    return out


def _run(spark, texts: dict[int, str], phrase: list[str]):
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    rows = phrase_search(docs, phrase).collect()
    return {r.doc_id: (r.n_matches, r.first_pos) for r in rows}


TEXTS = {
    1: "a b a b a",            # overlapping "a b a" at 0 and 2
    2: "a a a a",              # repeated-word phrase "a a" at 0,1,2
    3: "x a b a y a b a",      # two disjoint "a b a"
    4: "b a b",                # no match for "a b a" (only partial)
    5: "a b",                  # shorter than a 3-word phrase
    6: "c c c",                # no phrase words at all
}


@pytest.mark.parametrize(
    "phrase",
    [["a", "b", "a"], ["a", "a"], ["a", "b"], ["b"], ["a", "b", "a", "y"]],
)
def test_phrase_search_matches_reference(spark, phrase):
    assert _run(spark, TEXTS, phrase) == _reference(TEXTS, phrase)


def test_phrase_never_matches_across_boundary(spark):
    # "b a" occurs inside doc 1 but a phrase must not match a start
    # whose window would run past the end of the document
    got = _run(spark, {7: "x y b"}, ["b", "a"])
    assert got == {}
