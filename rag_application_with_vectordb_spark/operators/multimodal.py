"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The engine treats image/audio/video as ``binary`` columns with typed
metadata, processed by Arrow-batched ``mapInPandas`` stages. The actual
codec work (PIL/ffmpeg/librosa) is NOT available in this container, so
:func:`decode_media_stub` computes a deterministic fake feature set from
the raw bytes — the Spark-side plumbing (schema, batch iteration,
partition-parallel UDF signature) is real and tested; swap
``_fake_features`` for a real decoder in production.

Scale: ``mapInPandas`` streams Arrow record batches per partition, so a
100 TB binary corpus decodes with zero driver involvement and memory
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``. Binary
payloads should be size-bucketed at write time so partitions stay even.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "scene_change_stub",
    "with_binary_payload",
    "decode_media_stub",
    "resize_media_stub",
    "sample_frames_stub",
    "phash_stub",
    "audio_frames_stub",
]


def with_binary_payload(df: DataFrame, text_col: str = "text", out_col: str = "payload") -> DataFrame:
    """Materialize a binary column (UTF-8 bytes of ``text_col``) — the
    fixtures ship no real media, so tests fabricate payloads this way."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "UTF-8"))


def _fake_features(payload: bytes) -> tuple[int, int, int, int]:
    """Deterministic stand-in for a real image/video decode.

    A real implementation would be, e.g.::

        img = PIL.Image.open(io.BytesIO(payload))   # not in this container
        return len(payload), img.width, img.height, getattr(img, "n_frames", 1)
    """
    n = len(payload)
    return n, n % 640, (n * 7) % 480, n % 30 + 1


def decode_media_stub(df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload") -> DataFrame:
    """Decode / feature-extract stage over a binary column.

    Output: ``id_col, n_bytes, width, height, n_frames`` — all derived
    deterministically from the payload so the pipeline is
    oracle-checkable end-to-end.
    """
    from ..session import _ship_package

    _ship_package(df.sparkSession)
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("width", T.LongType()),
            T.StructField("height", T.LongType()),
            T.StructField("n_frames", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf[bin_col].map(_fake_features)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "n_bytes": feats.map(lambda f: f[0]),
                    "width": feats.map(lambda f: f[1]),
                    "height": feats.map(lambda f: f[2]),
                    "n_frames": feats.map(lambda f: f[3]),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(run, schema=schema)


def resize_media_stub(
    df: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "payload",
    target_w: int = 64,
    target_h: int = 48,
) -> DataFrame:
    """Resize stage: binary in → binary out, 1:1 rows.

    The deterministic stand-in truncates the payload to the target pixel
    budget (``target_w·target_h`` bytes); a real implementation would be
    ``PIL.Image.open(...).resize((w, h)).tobytes()``. Output keeps the
    payload column binary plus SQL-checkable sizes, so the catalog query
    can oracle the plumbing while pytest checks the bytes.
    """
    from ..session import _ship_package

    _ship_package(df.sparkSession)
    budget = target_w * target_h
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("orig_bytes", T.LongType()),
            T.StructField("resized", T.BinaryType()),
            T.StructField("resized_bytes", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pdf[bin_col].map(lambda b: bytes(b)[:budget])
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "orig_bytes": pdf[bin_col].map(len).astype("int64"),
                    "resized": resized,
                    "resized_bytes": resized.map(len).astype("int64"),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(run, schema=schema)


def sample_frames_stub(
    df: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "payload",
    stride: int = 5,
) -> DataFrame:
    """Frame-sampling stage: one row in → one row per sampled frame.

    Frame count comes from the stubbed decode (``n_bytes % 30 + 1``);
    every ``stride``-th frame is emitted with its byte window
    (``frame_off``, ``frame_len``) and the sliced frame payload. A real
    implementation would seek the container format instead of slicing.

    Scale: the fan-out happens inside ``mapInPandas`` per Arrow batch —
    no driver round-trip, no explode-shuffle; output partitioning
    follows the input.
    """
    from ..session import _ship_package

    _ship_package(df.sparkSession)
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_no", T.LongType()),
            T.StructField("frame_off", T.LongType()),
            T.StructField("frame_len", T.LongType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {c.name: [] for c in schema.fields}
            for doc_id, payload in zip(pdf[id_col], pdf[bin_col]):
                b = bytes(payload)
                n = len(b)
                n_frames = n % 30 + 1
                frame_len = max(n // n_frames, 1)
                for f in range(0, n_frames, stride):
                    off = f * frame_len
                    out[id_col].append(int(doc_id))
                    out["frame_no"].append(f)
                    out["frame_off"].append(off)
                    out["frame_len"].append(frame_len)
                    out["frame"].append(b[off : off + frame_len])
            yield pd.DataFrame(out)

    return df.select(id_col, bin_col).mapInPandas(run, schema=schema)


def phash_stub(
    df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload"
) -> DataFrame:
    """Perceptual hash over a binary payload: deterministic 64-cell
    'image' (byte sums at stride 64 — the stand-in for a real
    decode+resize+DCT), one bit per cell via the integer mean test
    ``cell*64 > total``, emitted as four 16-bit chunks ``h0..h3`` so
    downstream Hamming blocking can pigeonhole on chunk equality.

    A real pipeline would decode with PIL, resize to 8x8 grayscale and
    threshold the DCT lowpass — same schema, same chunked-bits output,
    swap the numpy body. Arrow-batched mapInPandas; integer-only, so
    the hash is reproducible anywhere (the DuckDB oracle recomputes it
    from the payload text).
    """
    from ..session import _ship_package

    _ship_package(df.sparkSession)
    import numpy as np

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("h0", T.LongType()),
            T.StructField("h1", T.LongType()),
            T.StructField("h2", T.LongType()),
            T.StructField("h3", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {id_col: pdf[id_col].astype("int64"), "h0": [], "h1": [], "h2": [], "h3": []}
            for payload in pdf[bin_col]:
                b = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.int64)
                cells = np.zeros(64, dtype=np.int64)
                for k in range(64):
                    cells[k] = int(b[k::64].sum())
                total = int(cells.sum())
                bits = (cells * 64 > total).astype(np.int64)
                for c in range(4):
                    out[f"h{c}"].append(int((bits[c * 16 : (c + 1) * 16] << np.arange(16)).sum()))
            yield pd.DataFrame(out)

    return df.select(id_col, bin_col).mapInPandas(run, schema)



def audio_frames_stub(
    df: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "payload",
    frame: int = 64,
) -> DataFrame:
    """Audio frame analysis over a binary payload: treat the bytes as
    8-bit unsigned PCM (recentred at 128, the WAV u8 convention), cut
    into fixed ``frame``-sample windows (last frame partial), and emit
    per-frame integer features — sample count, energy (sum of squared
    amplitudes), and peak amplitude.

    A real pipeline would decode with soundfile/librosa and compute the
    same per-frame features over fp32 PCM — same schema, same
    one-row-per-frame fan-out, swap the numpy body. Integer-only here so
    the output is value-checkable cross-engine (the DuckDB oracle
    recomputes it from the payload text). Arrow-batched ``mapInPandas``;
    the frame fan-out happens inside the batch, so a long recording
    never materializes per-frame rows on the driver.
    """
    from ..session import _ship_package

    _ship_package(df.sparkSession)
    import numpy as np

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_id", T.LongType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("energy", T.LongType()),
            T.StructField("peak", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fids, ns, en, pk = [], [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[bin_col]):
                s = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.int64) - 128
                for f in range(0, max(len(s), 1), frame):
                    w = s[f : f + frame]
                    if len(w) == 0:
                        continue
                    ids.append(int(doc_id))
                    fids.append(f // frame)
                    ns.append(len(w))
                    en.append(int((w * w).sum()))
                    pk.append(int(np.abs(w).max()))
            yield pd.DataFrame(
                {id_col: ids, "frame_id": fids, "n_samples": ns, "energy": en, "peak": pk}
            )

    return df.select(id_col, bin_col).mapInPandas(run, schema)


def scene_change_stub(
    df: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "payload",
) -> DataFrame:
    """Scene-change detection stage: one row in -> one row per adjacent
    frame pair, flagging cuts where the inter-frame intensity delta
    exceeds 10% of the pair's combined intensity.

    Frame geometry matches ``sample_frames_stub`` (n_bytes %% 30 + 1
    frames, floor-divided length, Python-slice clamping); "intensity"
    is the exact integer byte sum of the frame window — a stand-in for
    the luma histogram a real detector computes, with the same dataflow
    (decode -> per-frame feature -> adjacent-pair compare). Integer
    arithmetic end to end, so the OUTPUT is value-checked cross-engine
    (the pHash/audio-energy precedent). The pairwise compare happens
    inside ``mapInPandas`` per Arrow batch: no explode-shuffle, no
    self-join on (doc, frame) — output partitioning follows the input.
    """
    from ..session import _ship_package

    _ship_package(df.sparkSession)
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_no", T.LongType()),
            T.StructField("intensity", T.LongType()),
            T.StructField("prev_intensity", T.LongType()),
            T.StructField("delta", T.LongType()),
            T.StructField("is_cut", T.BooleanType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {c.name: [] for c in schema.fields}
            for doc_id, payload in zip(pdf[id_col], pdf[bin_col]):
                b = bytes(payload)
                n = len(b)
                n_frames = n % 30 + 1
                frame_len = max(n // n_frames, 1)
                prev = None
                for f in range(n_frames):
                    off = f * frame_len
                    inten = sum(b[off : off + frame_len])
                    if prev is not None:
                        delta = inten - prev
                        out[id_col].append(int(doc_id))
                        out["frame_no"].append(f)
                        out["intensity"].append(inten)
                        out["prev_intensity"].append(prev)
                        out["delta"].append(delta)
                        out["is_cut"].append(20 * abs(delta) > inten + prev)
                    prev = inten
            yield pd.DataFrame(out)

    return df.select(id_col, bin_col).mapInPandas(run, schema)
