"""M1 progress-metric tests (reference formula, App.tsx:53,82-85)."""

from __future__ import annotations

import pytest

from rag_application_with_vectordb_spark.embedder import ApiEmbedder
from rag_application_with_vectordb_spark.progress import IngestProgress
from rag_application_with_vectordb_spark.sources.pdf import (
    parse_documents,
    read_binary_documents,
)


def test_progress_accumulates_through_full_ingest(spark, tmp_path):
    for i in range(4):
        (tmp_path / f"d{i}.pdf").write_bytes(f"document {i} ".encode() * 30)
    progress = IngestProgress(spark)
    assert progress.percentage(4, 8) == 0.0

    binary = read_binary_documents(spark, str(tmp_path))
    docs = parse_documents(binary, parser=lambda b: b.decode(), progress=progress)
    docs.count()  # action → parse stage runs
    assert progress.parsed.value == 4
    assert progress.percentage(4, 4) == pytest.approx(15.0)

    emb = ApiEmbedder(transport=lambda ts: [[1.0, 0.0]] * len(ts), dim=2, api_batch_size=2)
    emb.embed_df(docs, progress=progress).count()
    assert progress.embedded.value == 4
    # parse 15% + embed 85% → complete
    assert progress.percentage(4, 4) == pytest.approx(100.0)
