"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as BinaryType columns with a typed
metadata struct alongside. Decode / feature-extract runs as Arrow-batched
``mapInPandas`` — the Spark-side contract (schema, batch shape, partition
behavior) is real and tested.

Codec status: AUDIO decode is REAL — ``decode_wav_pcm16`` below is an
actual RIFF/PCM16 chunk-walking parser in pure numpy+struct (no external
libraries needed), oracle-verified end-to-end. Image/video decode stays
stubbed behind ``decode_stub`` because no image codec library exists in
this container (clearly marked; swap for PIL/ffmpeg in a real
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


# ---------------------------------------------------------------------------
# REAL codec: WAV (RIFF / PCM16). Unlike the image stubs above, this is
# an actual decoder — pure numpy + struct, no external libraries — so the
# audio half of the multimodal surface runs decode-for-real end-to-end:
# RIFF magic validation, chunk walk, fmt parse (PCM, mono, 16-bit), PCM
# block decode to int16, then vectorized feature extraction.
# ---------------------------------------------------------------------------

WAV_FEATURES_SCHEMA = (
    "doc_id bigint, sample_rate int, n_samples int, peak_abs int, "
    "sum_sq bigint, n_zero_cross int"
)


def encode_wav_pcm16(samples, sample_rate: int = 8000) -> bytes:
    """Minimal valid RIFF/WAVE writer (PCM, mono, 16-bit LE)."""
    import struct

    import numpy as np

    data = np.asarray(samples).astype("<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def decode_wav_pcm16(payload: bytes):
    """Parse a RIFF/WAVE payload: returns (sample_rate, int16 ndarray).

    A real chunk-walking parser (not a fixed-offset slice): validates the
    RIFF/WAVE magics, iterates chunks honoring the odd-size pad byte,
    reads fmt (rejecting anything but PCM mono 16-bit), and decodes the
    data block. Raises ValueError on malformed input — corrupt payloads
    surface as errors, not silent garbage."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, sr, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_tag, channels, sr = struct.unpack("<HHI", body[:8])
            (bits,) = struct.unpack("<H", body[14:16])
            if (fmt_tag, channels, bits) != (1, 1, 16):
                raise ValueError(f"unsupported wav format {(fmt_tag, channels, bits)}")
        elif cid == b"data":
            data = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)
    if sr is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return sr, data


def wav_features(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Decode WAV payloads and extract integer-exact audio features
    (peak amplitude, energy, zero crossings) — Arrow-batched, partition-
    local, no shuffle. Integer features (not float RMS) so the result is
    bit-exact across engines and a SQL oracle can verify the decode."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                sr, s = decode_wav_pcm16(bytes(payload))
                s64 = s.astype(np.int64)
                rows.append(
                    (
                        int(i),
                        int(sr),
                        len(s),
                        int(np.max(np.abs(s64))) if len(s) else 0,
                        int(np.sum(s64 * s64)),
                        int(np.count_nonzero(s64[1:] * s64[:-1] < 0)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "sample_rate", "n_samples", "peak_abs", "sum_sq", "n_zero_cross"],
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=WAV_FEATURES_SCHEMA)
