"""Multimodal-column operators: image/audio/video as opaque ``binary``
columns with typed metadata (north-star training-pipeline surface).

The container has no decode libraries (no PIL/ffmpeg/torchaudio), so the
DECODE step is stubbed: ``_decode_stub`` derives a deterministic
fixed-shape pseudo-feature from the payload bytes (md5-seeded), and the
real decoders raise ``NotImplementedError`` behind an import-try.  What
IS real — and tested — is every piece of Spark plumbing a production
multimodal pipeline needs:

* asset table schema: (asset_id, media_type, payload binary, meta struct)
* metadata profiling as plain relational ops (oracle-checked)
* content fingerprinting over the binary column (oracle-checked)
* Arrow-batched decode/feature-extract via mapInPandas (batch shape,
  schema, partitioning all real; hash-checked per-dimension — the
  md5-seeded stub is exactly reproducible in SQL)
* frame sampling as a 1→N UDTF-shaped expansion (rows-only check)

Payloads are synthesized from `documents.text` bytes so every engine and
the DuckDB oracle see identical binary content.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import table

FEATURE_DIM = 8

try:  # pragma: no cover - not installed in this container
    import PIL.Image  # noqa: F401

    HAVE_IMAGE_DECODE = True
except ImportError:
    HAVE_IMAGE_DECODE = False


def decode_image(payload: bytes):  # pragma: no cover - decode lib absent
    """Real image decode — requires PIL, absent here by design."""
    if not HAVE_IMAGE_DECODE:
        raise NotImplementedError(
            "image decode requires PIL; this container stubs the decode "
            "step (see _decode_stub) while keeping the Spark plumbing real"
        )
    raise NotImplementedError


def media_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the asset table: payload = UTF-8 bytes of the document
    text (opaque to everything downstream), media_type cycled over four
    modalities, metadata struct typed per modality."""
    docs = table(spark, sf_dir, "documents")
    media_type = F.element_at(
        F.array(F.lit("image/jpeg"), F.lit("image/png"), F.lit("audio/wav"),
                F.lit("video/mp4")),
        (F.col("doc_id") % 4 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        media_type.alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            (F.col("doc_id") % 640 + 16).cast("int").alias("width"),
            (F.col("doc_id") % 480 + 16).cast("int").alias("height"),
            (F.col("doc_id") % 8 + 1).cast("int").alias("duration_s"),
            F.col("n_chars").cast("long").alias("byte_len"),
        ).alias("meta"),
    )


# --- M1 metadata profile (oracle-checked: pure relational over meta) --------

def q_media_profile(spark, sf_dir):
    assets = media_assets(spark, sf_dir)
    return assets.groupBy("media_type").agg(
        F.count("*").alias("n_assets"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.max("meta.width").cast("long").alias("max_width"),
        F.sum("meta.duration_s").cast("long").alias("total_duration_s"),
    )


O_MEDIA_PROFILE = """
WITH assets AS (
  SELECT doc_id AS asset_id,
         ['image/jpeg','image/png','audio/wav','video/mp4'][(doc_id % 4 + 1)::INT]
           AS media_type,
         encode(text) AS payload,
         (doc_id % 640 + 16) AS width,
         (doc_id % 8 + 1) AS duration_s
  FROM documents)
SELECT media_type, count(*) AS n_assets,
       CAST(sum(octet_length(payload)) AS BIGINT) AS total_bytes,
       CAST(max(width) AS BIGINT) AS max_width,
       CAST(sum(duration_s) AS BIGINT) AS total_duration_s
FROM assets GROUP BY media_type
"""

# --- M2 binary fingerprint (oracle-checked: md5 over the payload) -----------

def q_media_fingerprint(spark, sf_dir):
    assets = media_assets(spark, sf_dir)
    return assets.select(
        "asset_id",
        F.md5("payload").alias("content_md5"),
        F.conv(F.substring(F.md5("payload"), 1, 8), 16, 10)
        .cast("long")
        .alias("fp64"),
    )


O_MEDIA_FP = """
SELECT doc_id AS asset_id,
       md5(text) AS content_md5,
       CAST(('0x' || substring(md5(text), 1, 8))::BIGINT AS BIGINT) AS fp64
FROM documents
"""

# --- M3 decode + feature extraction via mapInPandas (rows-only) -------------

def _decode_stub(payload: bytes) -> np.ndarray:
    """Deterministic pseudo-decode: md5 digest bytes → FEATURE_DIM floats
    in [0,1).  Stands in for decode→embed; same signature and batch shape
    a real decoder-UDF would have."""
    digest = hashlib.md5(payload).digest()
    raw = np.frombuffer(digest[:FEATURE_DIM], dtype=np.uint8)
    return raw.astype("f8") / 256.0


def q_media_decode_features(spark, sf_dir):
    """Arrow-batched decode/feature-extract: mapInPandas so one Python
    worker handles a whole Arrow batch of binary payloads (the only
    viable shape at 100 TB — per-row UDF round-trips would drown in
    serialization).  The feature vector is exploded to one row per
    dimension: list columns crash the driver's pandas canonicalizer
    (r4 lesson, same as r1's array_ops), and per-dim scalars let the
    md5-seeded stub be hash-checked exactly — each value is
    digest_byte/256.0, a dyadic rational both engines compute bitwise
    identically."""
    assets = media_assets(spark, sf_dir)

    def extract(batches):
        for pdf in batches:
            feats = [
                _decode_stub(p).tolist() for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "feature": feats,
                }
            )

    decoded = assets.mapInPandas(
        extract, schema="asset_id long, media_type string, feature array<double>"
    )
    return decoded.select(
        "asset_id",
        "media_type",
        F.posexplode("feature").alias("dim", "value"),
    ).withColumn("dim", F.col("dim").cast("long"))


O_DECODE_FEATURES = """
WITH assets AS (
  SELECT doc_id AS asset_id,
         ['image/jpeg','image/png','audio/wav','video/mp4'][(doc_id % 4 + 1)::INT]
           AS media_type,
         md5(text) AS h
  FROM documents),
dims AS (SELECT unnest(range(0, 8)) AS dim)
SELECT asset_id, media_type, CAST(dim AS BIGINT) AS dim,
       (('0x' || substring(h, (dim * 2 + 1)::INT, 2))::INT) / 256.0 AS value
FROM assets CROSS JOIN dims
"""


# --- M4 frame sampling: 1 video → N frame rows (UDTF shape, rows-only) ------

def q_media_frame_sample(spark, sf_dir):
    """Each video asset expands to one row per sampled frame (1 fps over
    meta.duration_s) with a per-frame fingerprint — the frame-sampling
    UDTF shape (posexplode over a generated frame index).  The frame
    fingerprint is md5 over (payload ‖ ':' ‖ frame index), which on the
    UTF-8 payload is byte-identical to DuckDB's string md5 — so this row
    is fully hash-checked, not rows-only."""
    assets = media_assets(spark, sf_dir).where(
        F.col("media_type") == "video/mp4"
    )
    frames = assets.select(
        "asset_id",
        F.posexplode(F.sequence(F.lit(0), F.col("meta.duration_s") - 1)).alias(
            "frame_idx", "_"
        ),
    ).drop("_")
    with_payload = frames.join(
        media_assets(spark, sf_dir).select("asset_id", "payload"), "asset_id"
    )
    return with_payload.select(
        "asset_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.md5(F.concat(F.col("payload"), F.lit(":").cast("binary"),
                       F.col("frame_idx").cast("string").cast("binary")))
        .alias("frame_md5"),
    )


O_FRAME_SAMPLE = """
WITH assets AS (
  SELECT doc_id AS asset_id, text, (doc_id % 8 + 1) AS duration_s
  FROM documents
  WHERE (doc_id % 4) = 3),
frames AS (
  SELECT asset_id, text, unnest(range(0, duration_s)) AS frame_idx
  FROM assets)
SELECT asset_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       md5(text || ':' || frame_idx::VARCHAR) AS frame_md5
FROM frames
"""


# --- M5 exact binary dedup (⊕ r9) --------------------------------------------

def q_media_dedup_exact(spark, sf_dir):
    """Exact duplicate detection over opaque binary payloads — the first
    pass of every multimodal ingestion pipeline (the image-corpus
    analogue of textops.q_dedup_exact).  Key = (content md5, byte
    length): the checksum is computed MAP-SIDE at the scan, so only
    (32-char hash, long) pairs ever shuffle — payload bytes never leave
    their scan task, which at 100 TB of images is the difference
    between shuffling kilobyte keys and shuffling the corpus.  Groups
    with >1 asset emit their non-canonical members against the
    lowest-id survivor.

    Duplication is planted by construction (the documents corpus has
    ZERO raw duplicate texts at every sf — FIXTURES.md fact 3, which
    would make a raw-payload key vacuous): each run of 5 consecutive
    asset ids shares its anchor's payload — the re-upload/mirror
    duplication shape real image corpora exhibit."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    # checksum + length are computed INSIDE the anchor projection, i.e.
    # map-side at the scan, so the anchor join ships (id, 32-char hash,
    # long) — never payload bytes (review r9 #2: hashing after the join
    # would shuffle the whole corpus, the exact cost this query exists
    # to avoid)
    anchors = docs.select(
        F.col("doc_id").alias("anchor_id"),
        F.md5(F.encode("text", "UTF-8")).alias("content_md5"),
        F.length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
    )
    keyed = docs.select(
        F.col("doc_id").alias("asset_id"),
        (F.col("doc_id") - F.col("doc_id") % 5).alias("anchor_id"),
    ).join(anchors, "anchor_id")
    groups = (
        keyed.groupBy("content_md5", "n_bytes")
        .agg(
            F.count("*").alias("n_copies"),
            F.min("asset_id").alias("canonical_id"),
        )
        .where(F.col("n_copies") > 1)
    )
    return (
        keyed.join(groups, ["content_md5", "n_bytes"])
        .where(F.col("asset_id") != F.col("canonical_id"))
        .select(
            "content_md5",
            "n_bytes",
            "n_copies",
            "canonical_id",
            F.col("asset_id").alias("dup_id"),
        )
    )


O_MEDIA_DEDUP = """
WITH keyed AS (
  SELECT a.doc_id AS asset_id, md5(b.text) AS content_md5,
         CAST(octet_length(encode(b.text)) AS BIGINT) AS n_bytes
  FROM documents a JOIN documents b ON b.doc_id = a.doc_id - a.doc_id % 5),
groups AS (
  SELECT content_md5, n_bytes, CAST(count(*) AS BIGINT) AS n_copies,
         min(asset_id) AS canonical_id
  FROM keyed GROUP BY 1, 2 HAVING count(*) > 1)
SELECT content_md5, n_bytes, n_copies, canonical_id,
       asset_id AS dup_id
FROM keyed JOIN groups USING (content_md5, n_bytes)
WHERE asset_id <> canonical_id
"""


QUERIES = {
    "media_profile": q_media_profile,
    "media_fingerprint": q_media_fingerprint,
    "media_decode_features": q_media_decode_features,
    "media_frame_sample": q_media_frame_sample,
    "media_dedup_exact": q_media_dedup_exact,
}

ORACLES = {
    "media_profile": O_MEDIA_PROFILE,
    "media_fingerprint": O_MEDIA_FP,
    "media_decode_features": O_DECODE_FEATURES,
    "media_frame_sample": O_FRAME_SAMPLE,
    "media_dedup_exact": O_MEDIA_DEDUP,
}
