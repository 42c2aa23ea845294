"""Document ingestion source: binary files → text (reference S1/S2).

The reference reads one user-selected PDF in the browser and parses it
with pdf.js in a Web Worker (``App.tsx:46-54``), concatenating per-page
text items with spaces and pages with newlines (P1). The engine's
translation:

- S2 file-type predicate → ``pathGlobFilter`` on the ``binaryFile``
  reader (pushed into file listing, no data read for rejected files).
- S1 parse → an Arrow-batched ``mapInPandas`` stage over the binary
  content; the worker boundary becomes the executor-task boundary.

The PDF codec itself is pluggable: ``pypdf`` is used when importable
(it is NOT in this container — the import-try keeps the module loadable
and the error explicit), and tests inject a plain-text parser to
exercise the full plumbing with fabricated files.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["read_binary_documents", "parse_documents", "pdf_text_parser"]


def read_binary_documents(
    spark: SparkSession, path: str, glob: str = "*.pdf"
) -> DataFrame:
    """S1 scan + S2 predicate: binary files matching ``glob``.

    ``binaryFile`` yields (path, modificationTime, length, content);
    the glob filter is applied at listing time — the Spark analog of the
    reference's extension check (``App.tsx:28``) before any bytes move.
    """
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )


def pdf_text_parser(content: bytes) -> str:
    """Per-file PDF → text with the reference's concatenation semantics
    (P1, ``App.tsx:49-54``): page text items joined with ' ', pages
    accumulated with a trailing newline each.

    Uses ``pypdf`` when importable (full filter/encoding coverage); falls
    back to the built-in deterministic extractor
    (:mod:`~rag_application_with_vectordb_spark.sources.pdfcodec` —
    classic-xref PDFs, raw or FlateDecode streams, Tj/TJ/'/\" text) so a
    real PDF flows end-to-end even in environments with no PDF library.
    Inject ``parser=...`` into :func:`parse_documents` for anything more
    exotic (scanned/OCR, CMap-encoded fonts).
    """
    try:
        import io

        from pypdf import PdfReader
    except ImportError:
        from .pdfcodec import extract_pdf_text

        return extract_pdf_text(content)
    reader = PdfReader(io.BytesIO(content))  # pragma: no cover
    full = ""
    for page in reader.pages:  # pragma: no cover
        full += page.extract_text() + "\n"
    return full  # pragma: no cover


def parse_documents(
    binary_df: DataFrame,
    parser: Callable[[bytes], str] | None = None,
    progress=None,
) -> DataFrame:
    """Binary documents → (doc_id, path, text, n_chars).

    ``doc_id`` is the xxhash64 of the path — stable across runs and
    cluster layouts (a positional id would depend on partitioning;
    SURVEY.md §7.3.3).
    """
    from ..session import _ship_package

    _ship_package(binary_df.sparkSession)
    parse = parser or pdf_text_parser
    schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("text", T.StringType()),
        ]
    )

    acc = progress.parsed if progress is not None else None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if acc is not None:
                acc.add(len(pdf))  # M1 parse progress (App.tsx:53)
            yield pd.DataFrame(
                {"path": pdf["path"], "text": [parse(bytes(c)) for c in pdf["content"]]}
            )

    parsed = binary_df.select("path", "content").mapInPandas(run, schema=schema)
    return parsed.select(
        F.xxhash64("path").alias("doc_id"),
        "path",
        "text",
        F.length("text").cast("long").alias("n_chars"),
    )
