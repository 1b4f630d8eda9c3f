"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as BinaryType columns with a typed
metadata struct alongside. Decode / feature-extract runs as Arrow-batched
``mapInPandas`` — the Spark-side contract (schema, batch shape, partition
behavior) is real and tested.

Codec status: AUDIO decode is REAL (``decode_wav_pcm16``: an actual
RIFF/PCM16 chunk-walking parser) and IMAGE decode+resize is REAL for
uncompressed bitmaps (``decode_bmp24`` + ``resize_nearest``: header
validation, bottom-up padded BGR rows, integer-grid nearest-neighbor) —
both pure numpy+struct, both oracle-verified end-to-end. Only
COMPRESSED formats (JPEG/PNG/MP4) remain behind the clearly-marked
``decode_stub``, because no compression codec library exists in this
container (swap for PIL/ffmpeg in a real deployment — the Spark
plumbing does not change).
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


AUDIO_FRAME_SCHEMA = "doc_id bigint, frame_idx int, n_frame_samples int, frame_energy bigint"


def audio_frame_energies(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_samples: int = 160,
) -> DataFrame:
    """Decode WAV payloads through the real PCM16 parser and frame the
    sample stream into fixed-length windows (the spectrogram / VAD
    precursor): one output row per frame with its integer-exact energy
    (sum of squared samples). The trailing partial frame is kept with
    its true length — silently dropping it would bias energy statistics
    at segment boundaries.

    mapInPandas, 1 -> n_frames rows, partition-local: fan-out is bounded
    by payload length, so at scale the parallelism unit stays the input
    split and downstream sees a normal exploded table — the same shape
    contract as ``sample_frames``, but over DECODED samples, not raw
    bytes."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, lens, energies = [], [], [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                _, s = decode_wav_pcm16(bytes(payload))
                s64 = s.astype(np.int64)
                for j in range(0, max(len(s64), 1), frame_samples):
                    frame = s64[j : j + frame_samples]
                    ids.append(int(i))
                    idxs.append(j // frame_samples)
                    lens.append(len(frame))
                    energies.append(int(np.sum(frame * frame)))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "frame_idx": idxs,
                    "n_frame_samples": lens,
                    "frame_energy": energies,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=AUDIO_FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# REAL codec: BMP (BITMAPINFOHEADER, 24-bit BI_RGB). Like the WAV codec,
# a genuine parser in pure numpy+struct: file/info header validation,
# bottom-up padded BGR row decode — plus a real nearest-neighbor resize.
# With both, image decode-resize-extract runs for real end-to-end; only
# compressed formats (JPEG/PNG) remain out of scope in this container.
# ---------------------------------------------------------------------------


def encode_bmp24(pixels) -> bytes:
    """Minimal valid 24bpp BMP writer. ``pixels`` is (h, w, 3) uint8 in
    RGB order, row 0 = top (stored bottom-up per the format)."""
    import struct

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    row_bytes = (w * 3 + 3) & ~3
    img = np.zeros((h, row_bytes), dtype=np.uint8)
    img[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    data = img.tobytes()
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    file_hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0, 14 + 40)
    return file_hdr + info + data


def decode_bmp24(payload: bytes):
    """Parse a 24bpp BI_RGB BMP: returns (h, w, 3) uint8 RGB, row 0 =
    top. Validates the 'BM' magic, header sizes, bit depth and
    compression; raises ValueError on anything else — corrupt or
    unsupported payloads surface as errors, not garbage pixels."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off_bits = struct.unpack("<I", payload[10:14])[0]
    (
        bi_size, w, h, planes, bits, compression, _size_img,
        _xppm, _yppm, _clr_used, _clr_imp,
    ) = struct.unpack("<IiiHHIIiiII", payload[14:54])
    if bi_size != 40 or planes != 1 or bits != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant {(bi_size, planes, bits, compression)}")
    if h <= 0 or w <= 0:
        raise ValueError("top-down/degenerate BMP not supported")
    row_bytes = (w * 3 + 3) & ~3
    img = np.frombuffer(payload, dtype=np.uint8, count=h * row_bytes, offset=off_bits)
    rows = img.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    return rows[::-1, :, ::-1]  # back to top-down RGB


def resize_nearest(pixels, out_h: int, out_w: int):
    """Real nearest-neighbor resize: source index = (dst * src) // dst_n
    (pure integer math, so any engine reproduces the sampling grid)."""
    import numpy as np

    px = np.asarray(pixels)
    h, w, _ = px.shape
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return px[ys][:, xs]


IMAGE_FEATURES_SCHEMA = (
    "doc_id bigint, width int, height int, sum_r bigint, sum_g bigint, sum_b bigint"
)


def image_resize_features(
    df: DataFrame, out_h: int = 8, out_w: int = 8,
    id_col: str = "doc_id", payload_col: str = "payload",
) -> DataFrame:
    """decode -> nearest-neighbor resize -> integer channel sums, all
    real, Arrow-batched and partition-local (no shuffle). Integer sums
    (not float means) so the result hash-compares across engines."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                px = resize_nearest(decode_bmp24(bytes(payload)), out_h, out_w)
                s = px.astype(np.int64).sum(axis=(0, 1))
                rows.append((int(i), out_w, out_h, int(s[0]), int(s[1]), int(s[2])))
            yield pd.DataFrame(
                rows, columns=[id_col, "width", "height", "sum_r", "sum_g", "sum_b"]
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


AHASH_SCHEMA = "doc_id bigint, ahash_hi bigint, ahash_lo bigint, n_set int"


def image_ahash(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Average-hash (aHash) perceptual fingerprint over REAL-decoded
    BMPs: decode -> integer nearest-neighbor 8x8 downsample -> integer
    grayscale (r+g+b)//3 -> bit i*8+j set iff gray > floor(mean). The
    64-bit hash is returned as two unsigned 32-bit halves in BIGINTs so
    cross-engine oracles never touch two's-complement sign wrap at bit
    63. Near-identical images differ in few bits (hamming distance), so
    this is the image-side analogue of SimHash: band the halves for
    candidate generation, verify by popcount. Arrow-batched,
    partition-local, no shuffle.
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                px = resize_nearest(decode_bmp24(bytes(payload)), 8, 8)
                gray = px.astype(np.int64).sum(axis=2) // 3  # (8, 8)
                mean = int(gray.sum()) // 64
                bits = (gray > mean).astype(np.uint64).ravel()  # idx = i*8 + j
                val = 0
                for idx in range(64):
                    if bits[idx]:
                        val |= 1 << idx
                rows.append(
                    (int(i), int(val >> 32), int(val & 0xFFFFFFFF), int(bits.sum()))
                )
            yield pd.DataFrame(rows, columns=[id_col, "ahash_hi", "ahash_lo", "n_set"])

    return df.select(id_col, payload_col).mapInPandas(run, schema=AHASH_SCHEMA)


def vad_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_samples: int = 160,
    energy_per_sample: int = 1000,
) -> DataFrame:
    """Energy-threshold voice-activity segmentation over REAL-decoded
    PCM (the VAD step an audio pipeline runs before ASR/feature
    extraction): frame the stream (:func:`audio_frame_energies`), mark a
    frame VOICED when its mean energy clears the threshold — stated as
    the integer-exact cross-multiplication ``frame_energy >=
    energy_per_sample * n_frame_samples``, so no engine ever divides —
    and merge consecutive voiced frames into spans (gaps-and-islands:
    group key = frame_idx - ROW_NUMBER over the doc's voiced frames).
    One row per span: ``(id, span_idx, start_frame, end_frame, n_frames,
    span_energy)`` — every value an exact integer.

    Scale shape: the decode fan-out is the framing operator's (bounded
    by payload length, partition-local); the islands windows partition
    by document id — per-partition state is one document's frame list,
    never the corpus — and the span aggregation is a hash agg with
    map-side combine on (id, island) keys."""
    from pyspark.sql.window import Window as W

    frames = audio_frame_energies(
        df, id_col=id_col, payload_col=payload_col, frame_samples=frame_samples
    )
    # n_frame_samples > 0 guards the degenerate zero-length frame: the
    # inclusive threshold would otherwise mark it trivially voiced
    # (0 >= t*0), so an EMPTY payload would emit a "voice" span (r15,
    # ADVICE) — semantically wrong for a VAD.
    voiced = frames.filter(
        (F.col("n_frame_samples") > 0)
        & (
            F.col("frame_energy")
            >= F.lit(energy_per_sample) * F.col("n_frame_samples")
        )
    )
    w = W.partitionBy(id_col).orderBy("frame_idx")
    islands = voiced.withColumn(
        "_isl", F.col("frame_idx") - F.row_number().over(w)
    )
    spans = islands.groupBy(id_col, "_isl").agg(
        F.min("frame_idx").alias("start_frame"),
        F.max("frame_idx").alias("end_frame"),
        F.count("*").cast("int").alias("n_frames"),
        F.sum("frame_energy").cast("bigint").alias("span_energy"),
    )
    w2 = W.partitionBy(id_col).orderBy("start_frame")
    return spans.select(
        id_col,
        F.row_number().over(w2).cast("int").alias("span_idx"),
        "start_frame",
        "end_frame",
        "n_frames",
        "span_energy",
    )
