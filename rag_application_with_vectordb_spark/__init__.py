"""rag_application_with_vectordb_spark — a PySpark-native analytics engine
with the query/data-processing capabilities of the reference RAG app
(RAKESHKUSHWAHA7518/Rag-application-with-VectorDB), re-expressed Spark-first.

The reference (see SURVEY.md) is a browser RAG pipeline:
PDF → sliding-window chunks → embeddings → in-memory vector store →
brute-force cosine top-k → LLM answer. This package generalizes that
surface to a distributed engine:

- ``functions.vector``  — cosine/dot/norm as Catalyst Column expressions
  (whole-stage codegen; reference ``services/vectorDb.ts:26-52`` semantics
  including the -1 dim-mismatch and 0 zero-norm edge cases).
- ``operators.knn``     — exact top-k scan (``vectorDb.ts:11-24``) and the
  batched broadcast KNN join.
- ``operators.chunker`` — the stride-800/window-1000 chunker
  (``App.tsx:57-59``) as posexplode(sequence)+substring.
- ``embedder``          — pluggable embedders: deterministic HashEmbedder
  (pure SQL, oracle-checkable) and an Arrow-batched pandas-UDF embedder
  mirroring the reference's batch+rate-limit API semantics
  (``geminiService.ts:27-77``, ``App.tsx:67-91``).
- ``rag``               — VectorStore (add/reset/isReady/search,
  ``vectorDb.ts:5-60``) and the ingest/ask pipelines (``App.tsx:26-224``).
- ``operators.dedup``   — LLM-data-pipeline extensions: exact/minhash-LSH/
  simhash/ngram-jaccard/embedding-cosine dedup.
- ``plans``             — the driver-checkable query catalog (every query
  paired with a DuckDB oracle SQL twin where SQL-expressible).
- ``streaming``         — Structured Streaming windows/watermark/session
  operators, with batch twins in ``plans`` for oracle checking.

Every operator is DataFrame-in/DataFrame-out and designed for a
1000-executor cluster: broadcast the small side, never collect the corpus,
precompute norms, partition by key, let AQE handle skew.
"""

__version__ = "0.1.0"
