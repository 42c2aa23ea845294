"""Chunker unit tests — exact reference semantics of App.tsx:57-61
(windows of CHUNK_SIZE at stride CHUNK_SIZE-CHUNK_OVERLAP, trim-filter)."""

from __future__ import annotations

from rag_application_with_vectordb_spark.operators.chunker import (
    CHUNK_OVERLAP,
    CHUNK_SIZE,
    chunk_documents,
    global_chunk_index,
)


def reference_chunker(text: str, chunk_size: int, overlap: int) -> list[str]:
    """Literal Python translation of the reference loop (App.tsx:57-61)."""
    out = []
    i = 0
    while i < len(text):
        out.append(text[i : i + chunk_size])
        i += chunk_size - overlap
    return [c for c in out if c.strip()]


def run_chunker(spark, texts, chunk_size=CHUNK_SIZE, overlap=CHUNK_OVERLAP):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = (
        chunk_documents(df, chunk_size=chunk_size, overlap=overlap)
        .orderBy("doc_id", "chunk_id")
        .collect()
    )
    by_doc: dict[int, list[str]] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["chunk_text"])
    return by_doc


def test_matches_reference_on_boundaries(spark):
    texts = [
        "x" * 999,  # one short window
        "x" * 1000,  # exactly one window
        "x" * 1001,  # two windows, second of length 201
        "x" * 1800,  # second window exactly full
        "a" * 5000,  # many windows
        "",  # empty → no chunks
        "   ",  # whitespace-only → filtered
        "éü" * 600,  # non-ASCII (chars, not bytes)
    ]
    got = run_chunker(spark, texts)
    for i, t in enumerate(texts):
        expect = reference_chunker(t, CHUNK_SIZE, CHUNK_OVERLAP)
        assert got.get(i, []) == expect, f"doc {i}"


def test_overlap_repeats_tail(spark):
    text = "".join(chr(ord("a") + i % 26) for i in range(2000))
    got = run_chunker(spark, [text])[0]
    # chars 800..999 of window n reappear as the head of window n+1
    assert got[0][800:1000] == got[1][:200]


def test_small_window_params(spark):
    texts = ["one two three four five six seven", "ab"]
    got = run_chunker(spark, texts, chunk_size=10, overlap=3)
    for i, t in enumerate(texts):
        assert got.get(i, []) == reference_chunker(t, 10, 3)


def test_reconstruction_property(spark):
    # SURVEY §5.2 property 3: dropping each window's leading overlap and
    # concatenating reproduces the source text exactly.
    import random

    rng = random.Random(42)
    texts = [
        "".join(rng.choice("abcdef ghij") for _ in range(rng.randrange(1, 4000)))
        for _ in range(10)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = (
        chunk_documents(df, keep_empty=True).orderBy("doc_id", "chunk_id").collect()
    )
    by_doc: dict[int, list[str]] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["chunk_text"])
    for i, t in enumerate(texts):
        chunks = by_doc[i]
        rebuilt = chunks[0] + "".join(c[CHUNK_OVERLAP:] for c in chunks[1:])
        assert rebuilt == t


def test_global_ids_dense(spark):
    df = spark.createDataFrame(
        [(7, "x" * 1500), (3, "y" * 2500)], "doc_id long, text string"
    )
    out = global_chunk_index(chunk_documents(df)).orderBy("global_id").collect()
    assert [r["global_id"] for r in out] == list(range(len(out)))
    # ordered by (doc_id, chunk_id): doc 3's chunks come first
    assert out[0]["doc_id"] == 3


def test_global_ids_guard_refuses_large_corpus(spark):
    import pytest

    df = spark.createDataFrame(
        [(i, "x" * 900) for i in range(8)], "doc_id long, text string"
    )
    chunks = chunk_documents(df)  # 8 docs x 2 chunks = 16 rows
    with pytest.raises(ValueError, match="one reducer"):
        global_chunk_index(chunks, max_rows=10).collect()
    # explicit opt-out still works (reference-parity path)
    out = global_chunk_index(chunks, max_rows=None).collect()
    assert sorted(r["global_id"] for r in out) == list(range(len(out)))
