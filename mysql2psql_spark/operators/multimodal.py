"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as BinaryType columns with a typed
metadata struct alongside. Decode / feature-extract runs as Arrow-batched
``mapInPandas`` — the Spark-side contract (schema, batch shape, partition
behavior) is real and tested; the actual codec call is stubbed behind
``decode_stub`` because the image/audio libraries are not in this
container (clearly marked; swap the stub for PIL/librosa/ffmpeg in a real
deployment — the Spark plumbing does not change).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = "doc_id bigint, n_bytes int, head_hex string"


def decode_stub(payload: bytes) -> dict:
    """STUB decoder: a real deployment replaces this with the codec
    (PIL.Image.open, librosa.load, ...). Deterministic so the pipeline is
    testable: reports payload size and the first-4-bytes hex 'magic'."""
    return {"n_bytes": len(payload), "head_hex": payload[:4].hex().upper()}


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Testdata has no binary column; treat the utf-8 encoding of the text
    as the opaque payload (schema-identical to a real image/audio column)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    mapInPandas: each partition streams pandas batches through the Python
    worker once (no per-row pickling); output schema is fixed so the plan
    stays analyzable. At scale, partition count = input splits; no shuffle.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(decode_stub)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "head_hex": [f["head_hex"] for f in feats],
                }
            )

    return df.select(id_col, "payload").mapInPandas(run, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_hex string"
RESIZE_SCHEMA = "doc_id bigint, payload binary, meta struct<orig_bytes: int, target_bytes: int, truncated: boolean>"


def resize_stub(payload: bytes, target_bytes: int) -> bytes:
    """STUB resize: a real deployment replaces this with the codec's
    rescale (PIL thumbnail, audio resample). Deterministic: truncate or
    zero-pad to the target size so the output schema/width contract is
    exercised end-to-end."""
    if len(payload) >= target_bytes:
        return payload[:target_bytes]
    return payload + b"\x00" * (target_bytes - len(payload))


def resize_payloads(
    df: DataFrame, target_bytes: int = 64, id_col: str = "doc_id"
) -> DataFrame:
    """Resize the binary column to a fixed width, carrying typed metadata
    (original size, target, whether truncation occurred) alongside — the
    image-thumbnail / audio-resample shape. mapInPandas, partition-local,
    1:1 rows, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": [resize_stub(p, target_bytes) for p in pdf["payload"]],
                    "meta": [
                        {
                            "orig_bytes": len(p),
                            "target_bytes": target_bytes,
                            "truncated": len(p) > target_bytes,
                        }
                        for p in pdf["payload"]
                    ],
                }
            )
            yield out

    return df.select(id_col, "payload").mapInPandas(run, schema=RESIZE_SCHEMA)


def decode_frame_stub(payload: bytes, offset: int, size: int) -> str:
    """STUB frame decoder: a real deployment replaces this with the codec's
    seek+decode (ffmpeg keyframe extraction, image tile crop, audio window
    FFT). Deterministic: the frame's raw bytes as hex."""
    return payload[offset : offset + size].hex().upper()


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    frame_bytes: int = 16,
    every: int = 4,
) -> DataFrame:
    """Frame-sample a binary payload column: split into fixed
    ``frame_bytes`` chunks and keep every ``every``-th one (the video
    keyframe-sampling shape; one output row per kept frame).

    mapInPandas (1 -> N rows): partition-local, no shuffle; output row
    count is |docs| x (n_frames / every), so the fan-out is bounded by
    payload size — at 100 TB the parallelism unit stays the input split,
    and downstream ops see a normal exploded table.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list = []
            idxs: list = []
            frames: list = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                n_frames = (len(payload) + frame_bytes - 1) // frame_bytes
                for j in range(0, n_frames, every):
                    ids.append(doc_id)
                    idxs.append(j)
                    frames.append(decode_frame_stub(payload, j * frame_bytes, frame_bytes))
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame_hex": frames})

    return df.select(id_col, "payload").mapInPandas(run, schema=FRAME_SCHEMA)
