"""Multimodal column operators (BASELINE.json north_star).

Contract: image/audio/video payloads are opaque ``binary`` columns with a
typed metadata struct alongside; decode / feature-extract / resize /
frame-sample run as Arrow-batched pandas functions over ``mapInPandas`` —
the only Spark-idiomatic shape for per-blob Python work (vectorized batch
transfer, no per-row pickling, partition-parallel).

Codec status: PCM WAV is a REAL codec (encode_wav_pcm16/decode_wav_pcm16
below — RIFF parsing with struct + numpy, no library needed; exercised
end-to-end by the oracled multimodal_wav_roundtrip query). Library-bound
formats (JPEG/MP3/MP4) stay gated: ``decode_image`` raises
NotImplementedError unless PIL is importable, and their tested paths use
``fake_decode_features`` — a deterministic md5-derived stand-in with the
exact same Spark-side plumbing (schema, batching, partitioning). Swapping
in a real library codec changes only the inner python function, as the
WAV path demonstrates.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Typed metadata carried next to every blob (never inside it).
BLOB_META_SCHEMA = StructType(
    [
        StructField("media_type", StringType()),  # image/png, audio/wav, ...
        StructField("source_uri", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("digest", StringType()),  # md5 of payload
        StructField("fake_width", IntegerType()),  # stub features
        StructField("fake_height", IntegerType()),
    ]
)


def with_blob_column(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Demo blob table: UTF-8 payload bytes + metadata struct. In production
    this is the parquet/iceberg table of raw media bytes."""
    return docs.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("payload").cast(BinaryType()),
        F.struct(
            F.lit("text/plain").alias("media_type"),
            F.concat(F.lit("mem://doc/"), F.col("doc_id")).alias("source_uri"),
            F.length(F.encode(F.col(text_col), "UTF-8")).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _have_pil() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def decode_image(payload: bytes):
    """Real image decode — requires PIL, absent in this container."""
    if not _have_pil():
        raise NotImplementedError(
            "image decode needs PIL; this environment stubs it — use "
            "fake_decode_features for the plumbing-equivalent path"
        )
    from io import BytesIO

    from PIL import Image

    return Image.open(BytesIO(payload))


def fake_decode_features(blobs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in decoder: md5-derived pseudo width/height.
    Exactly the batch shape a real decoder uses (iterator of Arrow-backed
    pandas frames in, frames out — constant memory per batch)."""
    for pdf in blobs:
        payloads = pdf["payload"]
        digests = [hashlib.md5(bytes(p)).hexdigest() for p in payloads]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": [len(bytes(p)) for p in payloads],
                "digest": digests,
                "fake_width": [int(d[:4], 16) % 1920 + 1 for d in digests],
                "fake_height": [int(d[4:8], 16) % 1080 + 1 for d in digests],
            }
        )


def extract_features(blob_df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over the blob table."""
    return blob_df.select("doc_id", "payload").mapInPandas(
        fake_decode_features, schema=FEATURE_SCHEMA
    )


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("in_w", IntegerType()),
        StructField("in_h", IntegerType()),
        StructField("out_w", IntegerType()),
        StructField("out_h", IntegerType()),
    ]
)


def fake_resize(target: int):
    """Aspect-preserving fit-resize stub (decode is md5-derived dims, the
    geometry arithmetic is the real thing a PIL ``thumbnail`` computes):
    scale = min(target/w, target/h), out = max(1, floor(dim*scale)).
    Pure IEEE f64 ops → bit-identical to the SQL oracle."""

    def _batches(blobs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        t = float(target)
        for pdf in blobs:
            digests = [hashlib.md5(bytes(p)).hexdigest() for p in pdf["payload"]]
            w = np.array([int(d[:4], 16) % 1920 + 1 for d in digests], dtype="float64")
            h = np.array([int(d[4:8], 16) % 1080 + 1 for d in digests], dtype="float64")
            scale = np.minimum(t / w, t / h)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "in_w": w.astype("int32"),
                    "in_h": h.astype("int32"),
                    "out_w": np.maximum(1, np.floor(w * scale)).astype("int32"),
                    "out_h": np.maximum(1, np.floor(h * scale)).astype("int32"),
                }
            )

    return _batches


def resize_stub(blob_df: DataFrame, target: int = 224) -> DataFrame:
    """mapInPandas resize over the blob table (real plumbing, stub codec)."""
    return blob_df.select("doc_id", "payload").mapInPandas(
        fake_resize(target), schema=RESIZE_SCHEMA
    )


def frame_sample_stub(blob_df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame index.
    The decode itself is stubbed (frame count derived from payload length —
    deterministic); schema/explode shape is the real one."""
    n_frames = (F.length("payload") / F.lit(64)).cast("int") + 1
    return (
        blob_df.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))).alias(
                "frame_idx"
            ),
        )
        .withColumn("frame_uri", F.concat(F.lit("frame://"), "doc_id", F.lit("#"), "frame_idx"))
    )


# --- REAL codec: PCM WAV (pure stdlib + numpy — no soundfile needed) -----
#
# The container lacks PIL/soundfile, but RIFF/WAVE PCM is a 44-byte header
# over raw little-endian samples — fully decodable with struct + numpy. This
# upgrades the audio path from "plumbing with a stubbed codec" to a REAL
# byte-level encode → decode → feature pipeline: the registered query
# synthesizes genuine WAV blobs, parses them back, and the DuckDB oracle
# recomputes the features from the closed-form sample generator — any
# header-layout or byte-order bug breaks the hash match.

import struct


def encode_wav_pcm16(samples, rate: int) -> bytes:
    """Mono 16-bit PCM WAV bytes (RIFF little-endian) from an int16 array."""
    import numpy as np

    data = np.asarray(samples, dtype="<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def decode_wav_pcm16(payload: bytes):
    """(sample_rate, int16 numpy array) from mono PCM WAV bytes; validates
    the RIFF/fmt layout loudly instead of guessing."""
    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    (size, fmt_tag, channels, rate, _br, _ba, bits) = struct.unpack(
        "<IHHIIHH", payload[16:36]
    )
    if (size, fmt_tag, channels, bits) != (16, 1, 1, 16):
        raise ValueError(f"unsupported WAV layout: {(size, fmt_tag, channels, bits)}")
    if payload[36:40] != b"data":
        raise ValueError("missing data chunk")
    (n_bytes,) = struct.unpack("<I", payload[40:44])
    return rate, np.frombuffer(payload[44 : 44 + n_bytes], dtype="<i2")


def synth_wav_blobs(docs: DataFrame, rate: int = 8000) -> DataFrame:
    """(doc_id, payload): real WAV bytes for the deterministic test signal
    s_i = ((doc_id*31 + i*17) % 2048) - 1024 over n = 160 + doc_id % 41
    samples — closed-form, so an SQL oracle can recompute every feature."""
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = 160 + d % 41
                i = np.arange(n, dtype="int64")
                s = ((d * 31 + i * 17) % 2048) - 1024
                out.append(encode_wav_pcm16(s.astype("<i2"), rate))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": out})

    return docs.select("doc_id").mapInPandas(gen, schema=schema)


WAV_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("peak_abs", LongType()),
        StructField("sum_abs", LongType()),
    ]
)


def wav_features(blob_df: DataFrame) -> DataFrame:
    """REAL decode: parse each WAV payload and emit exact integer features
    (Arrow-batched mapInPandas, constant memory per batch)."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = {"doc_id": [], "sample_rate": [], "n_samples": [], "peak_abs": [], "sum_abs": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, s = decode_wav_pcm16(bytes(payload))
                a = np.abs(s.astype("int64"))
                rows["doc_id"].append(doc_id)
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(len(s))
                rows["peak_abs"].append(int(a.max()) if len(a) else 0)
                rows["sum_abs"].append(int(a.sum()))
            yield pd.DataFrame(rows)

    return blob_df.select("doc_id", "payload").mapInPandas(
        feats, schema=WAV_FEATURE_SCHEMA
    )


# --- REAL codec: binary PPM (P6) images + integer nearest resize ---------


def encode_ppm(img) -> bytes:
    """P6 PPM bytes from an (h, w, 3) uint8 array — the simplest real
    image container (ASCII header + raw RGB), needing no library."""
    import numpy as np

    a = np.asarray(img, dtype="uint8")
    h, w, c = a.shape
    if c != 3:
        raise ValueError("PPM P6 is RGB")
    return f"P6\n{w} {h}\n255\n".encode() + a.tobytes()


def decode_ppm(payload: bytes):
    """(h, w, 3) uint8 array from P6 PPM bytes; validates the header.

    The header must be parsed positionally: exactly ONE whitespace byte
    follows maxval, and the raw RGB stream may well BEGIN with bytes that
    look like whitespace (0x20, 0x0a, ...) — a split()-based parse eats
    those pixels (the classic PPM decoder bug; caught by the oracle)."""
    import numpy as np

    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos = 2
    fields = []
    for _ in range(3):
        while payload[pos : pos + 1] in (b" ", b"\t", b"\r", b"\n"):
            pos += 1
        start = pos
        while payload[pos : pos + 1] not in (b" ", b"\t", b"\r", b"\n", b""):
            pos += 1
        fields.append(int(payload[start:pos]))
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    raw = payload[pos + 1 :]  # exactly one whitespace byte after maxval
    a = np.frombuffer(raw[: w * h * 3], dtype="uint8")
    if a.size != w * h * 3:
        raise ValueError("truncated pixel data")
    return a.reshape(h, w, 3)


def resize_nearest_fit(img, target: int):
    """REAL aspect-preserving nearest-neighbor resize, all-integer
    arithmetic: out = max(1, dim*target // max(w,h)); source index for
    output (i, j) is ((i*h) // oh, (j*w) // ow) — exactly reproducible in
    SQL with integer division, which is what makes the resize itself
    oracle-checkable (not just its geometry)."""
    import numpy as np

    h, w, _ = img.shape
    m = max(w, h)
    ow, oh = max(1, w * target // m), max(1, h * target // m)
    yi = (np.arange(oh, dtype="int64") * h) // oh
    xi = (np.arange(ow, dtype="int64") * w) // ow
    return img[yi][:, xi]


def synth_ppm_blobs(docs: DataFrame) -> DataFrame:
    """(doc_id, payload): real P6 bytes for the deterministic test image
    w = 8 + doc_id % 9, h = 6 + doc_id % 7,
    rgb(x, y) = ((doc_id + 7*p) % 256, (doc_id*3 + 5*p) % 256,
                 (doc_id*5 + 11*p) % 256) with p = y*w + x."""
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 8 + d % 9, 6 + d % 7
                p = np.arange(h * w, dtype="int64")
                img = np.stack(
                    [(d + 7 * p) % 256, (d * 3 + 5 * p) % 256, (d * 5 + 11 * p) % 256],
                    axis=1,
                ).reshape(h, w, 3)
                out.append(encode_ppm(img.astype("uint8")))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": out})

    return docs.select("doc_id").mapInPandas(gen, schema=schema)


PPM_RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("out_w", IntegerType()),
        StructField("out_h", IntegerType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
    ]
)


def ppm_resize_features(blob_df: DataFrame, target: int = 4) -> DataFrame:
    """REAL decode + REAL resize: parse each P6 payload, nearest-fit it to
    ``target``, emit exact per-channel sums over the resized pixels."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.name: [] for k in PPM_RESIZE_SCHEMA.fields}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_ppm(bytes(payload))
                small = resize_nearest_fit(img, target).astype("int64")
                rows["doc_id"].append(doc_id)
                rows["out_h"].append(small.shape[0])
                rows["out_w"].append(small.shape[1])
                rows["sum_r"].append(int(small[:, :, 0].sum()))
                rows["sum_g"].append(int(small[:, :, 1].sum()))
                rows["sum_b"].append(int(small[:, :, 2].sum()))
            yield pd.DataFrame(rows)

    return blob_df.select("doc_id", "payload").mapInPandas(
        feats, schema=PPM_RESIZE_SCHEMA
    )


# --- REAL container: length-prefixed PPM frame stream (video path) -------
#
# No video library exists in this container, but the video PIPELINE shape —
# parse a multi-frame byte stream, sample every Nth frame, decode sampled
# frames only — is fully exercisable over a real (if simple) container:
# b"RAWV" + u32 frame count + per-frame (u32 length, P6 PPM bytes). The
# decoder seeks frame boundaries from the length prefixes, so sampling
# skips the bytes of unsampled frames exactly as a real demuxer would.


def encode_frame_stream(frames) -> bytes:
    """Container bytes from a list of (h, w, 3) uint8 frames."""
    parts = [b"RAWV", struct.pack("<I", len(frames))]
    for f in frames:
        ppm = encode_ppm(f)
        parts.append(struct.pack("<I", len(ppm)))
        parts.append(ppm)
    return b"".join(parts)


def iter_sampled_frames(payload: bytes, every_n: int):
    """Yield (frame_idx, decoded frame) for frames 0, every_n, 2*every_n…;
    unsampled frames are SKIPPED by their length prefix, never decoded."""
    if payload[:4] != b"RAWV":
        raise ValueError("not a RAWV frame stream")
    (n_frames,) = struct.unpack("<I", payload[4:8])
    pos = 8
    for idx in range(n_frames):
        (ln,) = struct.unpack("<I", payload[pos : pos + 4])
        pos += 4
        if idx % every_n == 0:
            yield idx, decode_ppm(payload[pos : pos + ln])
        pos += ln
    if pos != len(payload):
        raise ValueError("trailing bytes after last frame")


def synth_video_blobs(docs: DataFrame) -> DataFrame:
    """(doc_id, payload): real frame-stream bytes. Deterministic fixture:
    n_frames = 5 + doc_id % 6; frame f is a (4+f%3) x 3 image with
    rgb(p) = ((doc_id + f + 2*p) % 256, (doc_id*2 + f + 3*p) % 256,
    (doc_id*3 + f + 5*p) % 256), p row-major."""
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                frames = []
                for f in range(5 + d % 6):
                    w, h = 4 + f % 3, 3
                    p = np.arange(h * w, dtype="int64")
                    img = np.stack(
                        [
                            (d + f + 2 * p) % 256,
                            (d * 2 + f + 3 * p) % 256,
                            (d * 3 + f + 5 * p) % 256,
                        ],
                        axis=1,
                    ).reshape(h, w, 3)
                    frames.append(img.astype("uint8"))
                out.append(encode_frame_stream(frames))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": out})

    return docs.select("doc_id").mapInPandas(gen, schema=schema)


FRAME_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_w", IntegerType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
    ]
)


def sampled_frame_features(blob_df: DataFrame, every_n: int = 2) -> DataFrame:
    """Parse each frame stream, decode every Nth frame ONLY, emit exact
    per-frame channel sums — fan-out rows like a real frame extractor."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.name: [] for k in FRAME_FEATURE_SCHEMA.fields}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for idx, img in iter_sampled_frames(bytes(payload), every_n):
                    a = img.astype("int64")
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(idx)
                    rows["frame_w"].append(img.shape[1])
                    rows["sum_r"].append(int(a[:, :, 0].sum()))
                    rows["sum_g"].append(int(a[:, :, 1].sum()))
                    rows["sum_b"].append(int(a[:, :, 2].sum()))
            yield pd.DataFrame(rows)

    return blob_df.select("doc_id", "payload").mapInPandas(
        feats, schema=FRAME_FEATURE_SCHEMA
    )
