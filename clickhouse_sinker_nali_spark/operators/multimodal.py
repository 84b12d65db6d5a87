"""Multimodal column handling: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with typed metadata
structs; decode / feature-extract / frame-sample run as Arrow-batched
Pandas UDFs over ``mapInPandas`` — the only sane shape for Python media
libs at scale (one Python worker per partition, Arrow zero-copy batches,
no per-row serialization).

The container has no image/audio libraries, so the actual decoders are
STUBBED: ``decode_image_meta`` tries PIL and falls back to a clearly-marked
deterministic fake (md5-derived dimensions).  The Spark-side plumbing —
binary schema, mapInPandas signature, Arrow batch shape, partition
behavior — is real and tested.  The fake decode is md5-based so the DuckDB
oracle reproduces it exactly (a real decoder would be checked rows-only).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..session import load_table

IMAGE_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("format", StringType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_hash", LongType()),
    ]
)


def attach_binary(docs: DataFrame) -> DataFrame:
    """Materialize an opaque binary payload column (here: utf-8 of text).

    In a real pipeline this column arrives from the source (parquet BINARY /
    a blob-store pointer resolved by a reader UDF); everything downstream
    only assumes ``blob: binary``.
    """
    return docs.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("blob"))


def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    """Deterministic fake image decode (md5-derived dims).

    STUB: the real implementation would be e.g.::

        from PIL import Image
        img = Image.open(io.BytesIO(payload)); return img.width, img.height, img.format

    md5-derived so the DuckDB oracle can verify the plumbing end-to-end.
    """
    h = int(hashlib.md5(payload).hexdigest()[:15], 16)
    return (h % 1920 + 1, h % 1080 + 1, ["jpeg", "png", "webp"][h % 3])


def decode_image_meta(blobs: DataFrame) -> DataFrame:
    """Arrow-batched 'decode' of binary payloads → typed metadata.

    mapInPandas: each Arrow batch arrives as a pandas DataFrame; the UDF
    appends decoded metadata columns.  Partitioning is preserved — no
    shuffle; Python cost is one round-trip per batch, not per row.
    """
    try:  # real decoder unavailable in this container — gate the import
        import PIL.Image  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["blob"]
            if have_pil:
                raise NotImplementedError(
                    "real PIL decode path not exercised in this container"
                )
            decoded = [_fake_decode(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": payloads.map(len).astype("int32"),
                    "width": pd.Series([d[0] for d in decoded], dtype="int32"),
                    "height": pd.Series([d[1] for d in decoded], dtype="int32"),
                    "format": [d[2] for d in decoded],
                }
            )

    return blobs.mapInPandas(decode, IMAGE_META_SCHEMA)


def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → binary payloads → Pandas-UDF decode → metadata table."""
    docs = load_table(spark, sf_dir, "documents")
    return decode_image_meta(attach_binary(docs)).orderBy("doc_id")


# DuckDB twin of the md5-derived fake decode (text is ASCII in the corpus,
# so md5(text) == md5(utf8 bytes) and strlen == byte length).
_H = "(('0x' || substr(md5(text), 1, 15))::BIGINT)"

MULTIMODAL_DECODE_SQL = f"""
SELECT doc_id,
       strlen(text)::INTEGER AS byte_len,
       ({_H} % 1920 + 1)::INTEGER AS width,
       ({_H} % 1080 + 1)::INTEGER AS height,
       (['jpeg', 'png', 'webp'])[{_H} % 3 + 1] AS format
FROM documents
ORDER BY doc_id
"""


def sample_frames(blobs: DataFrame, max_frames: int = 4) -> DataFrame:
    """Frame-sampling stub for video payloads: 1 row per sampled frame.

    Real implementation would pyav/ffmpeg-decode and emit keyframes; the
    deterministic fake emits ``(hash % max_frames) + 1`` frames whose hash
    chains the payload hash with the frame index.  mapInPandas emitting a
    *different* row count than the input demonstrates the explode-shaped
    UDF contract (output need not align 1:1 with input rows).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_hash": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["blob"]):
                h = int(hashlib.md5(bytes(payload)).hexdigest()[:15], 16)
                n = h % max_frames + 1
                for i in range(n):
                    fh = int(
                        hashlib.md5(f"{h}:{i}".encode()).hexdigest()[:15], 16
                    )
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_hash"].append(fh)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                    "frame_hash": pd.Series(out["frame_hash"], dtype="int64"),
                }
            )

    return blobs.mapInPandas(gen, FRAME_SCHEMA)


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(attach_binary(docs)).orderBy("doc_id", "frame_idx")


MULTIMODAL_FRAMES_SQL = f"""
WITH base AS (
    SELECT doc_id, {_H} AS h, {_H} % 4 + 1 AS n_frames FROM documents
)
SELECT doc_id, i::INTEGER AS frame_idx,
       (('0x' || substr(md5(h::VARCHAR || ':' || i::VARCHAR), 1, 15))::BIGINT)
           AS frame_hash
FROM base, LATERAL (SELECT unnest(range(0, n_frames)) AS i)
ORDER BY doc_id, frame_idx
"""


def resize_image_meta(blobs: DataFrame, max_dim: int = 256) -> DataFrame:
    """Resize stub: aspect-preserving downscale to ``max_dim``.

    Real implementation would decode, ``Image.resize``, re-encode; the stub
    reuses the fake-decoded dimensions and computes output dims with
    INTEGER-only arithmetic (``w*max_dim // max(w,h)``) so the oracle is
    exact in both engines.  Emits the resized-payload content hash a real
    resizer would write back to the blob store.
    """
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("out_width", IntegerType()),
            StructField("out_height", IntegerType()),
            StructField("resized_hash", LongType()),
        ]
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k.name: [] for k in schema.fields}
            for doc_id, payload in zip(pdf["doc_id"], pdf["blob"]):
                w, h, _fmt = _fake_decode(bytes(payload))
                m = max(w, h)
                ow, oh = (w, h) if m <= max_dim else (w * max_dim // m, h * max_dim // m)
                ow, oh = max(ow, 1), max(oh, 1)
                rh = int(hashlib.md5(f"resize:{w}x{h}->{ow}x{oh}".encode()).hexdigest()[:15], 16)
                rows["doc_id"].append(doc_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["out_width"].append(ow)
                rows["out_height"].append(oh)
                rows["resized_hash"].append(rh)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                    "width": pd.Series(rows["width"], dtype="int32"),
                    "height": pd.Series(rows["height"], dtype="int32"),
                    "out_width": pd.Series(rows["out_width"], dtype="int32"),
                    "out_height": pd.Series(rows["out_height"], dtype="int32"),
                    "resized_hash": pd.Series(rows["resized_hash"], dtype="int64"),
                }
            )

    return blobs.mapInPandas(resize, schema)


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return resize_image_meta(attach_binary(docs)).orderBy("doc_id")


MULTIMODAL_RESIZE_SQL = f"""
WITH dims AS (
    SELECT doc_id,
           ({_H} % 1920 + 1)::INTEGER AS width,
           ({_H} % 1080 + 1)::INTEGER AS height
    FROM documents
),
scaled AS (
    SELECT doc_id, width, height,
           CASE WHEN greatest(width, height) <= 256 THEN width
                ELSE greatest(width * 256 // greatest(width, height), 1) END AS out_width,
           CASE WHEN greatest(width, height) <= 256 THEN height
                ELSE greatest(height * 256 // greatest(width, height), 1) END AS out_height
    FROM dims
)
SELECT doc_id, width, height,
       out_width::INTEGER AS out_width, out_height::INTEGER AS out_height,
       (('0x' || substr(md5('resize:' || width || 'x' || height || '->'
            || out_width || 'x' || out_height), 1, 15))::BIGINT) AS resized_hash
FROM scaled
ORDER BY doc_id
"""


FEATURE_DIM = 8

_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def extract_features(blobs: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Feature-extraction stub: binary payload → dense embedding column.

    Real implementation: a vision/audio encoder over the decoded media
    (batched on GPU workers).  The fake derives each component from a
    chained md5 so the embedding is content-deterministic; the OUTPUT
    CONTRACT (``array<double>`` of fixed dim, ready for the similarity /
    quantization operators) is the part under test.
    """

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, vecs = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["blob"]):
                h = int(hashlib.md5(bytes(payload)).hexdigest()[:15], 16)
                vecs.append(
                    [
                        (int(hashlib.md5(f"{h}:f{i}".encode()).hexdigest()[:15], 16) % 2001 - 1000)
                        / 1000.0
                        for i in range(dim)
                    ]
                )
                ids.append(doc_id)
            yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"), "features": vecs})

    return blobs.mapInPandas(feats, _FEATURE_SCHEMA)


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(attach_binary(docs))
    # Serialize the embedding for the oracle harness: its canonicalizer
    # lexsorts with pandas and can't hash list cells (r01 `err` row).  The
    # components are exact multiples of 0.001, so fixed %.3f formatting is
    # bit-identical across Spark and DuckDB.
    return feats.select(
        "doc_id",
        F.array_join(
            F.transform("features", lambda x: F.format_string("%.3f", x)), ","
        ).alias("features"),
    ).orderBy("doc_id")


MULTIMODAL_FEATURES_SQL = f"""
WITH base AS (SELECT doc_id, {_H} AS h FROM documents)
SELECT doc_id,
       array_to_string(list_transform(range(0, {FEATURE_DIM}),
           i -> printf('%.3f',
                ((('0x' || substr(md5(h::VARCHAR || ':f' || i::VARCHAR), 1, 15))::BIGINT
                  % 2001 - 1000) / 1000.0))), ',') AS features
FROM base
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Audio: fixed-window chunking over decoded waveform metadata
# --------------------------------------------------------------------------

AUDIO_CHUNK_MS = 5_000  # 5-second training windows

AUDIO_CHUNK_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("chunk_idx", IntegerType()),
        StructField("start_ms", LongType()),
        StructField("end_ms", LongType()),
        StructField("chunk_samples", LongType()),
    ]
)


def chunk_audio(blobs: DataFrame, chunk_ms: int = AUDIO_CHUNK_MS) -> DataFrame:
    """Audio chunking stub: decode waveform header, emit one row per
    fixed-duration window (the speech-pipeline pretokenization step —
    whisper-style 5 s/30 s training windows over arbitrary-length clips).

    STUB decode: the real implementation is e.g. ``soundfile.read`` /
    ``torchaudio.load`` into (rate, n_samples); no audio libs exist in this
    container, so rate and length are md5-derived from the payload —
    deterministic, so the DuckDB oracle verifies the chunk arithmetic
    end-to-end.  The mapInPandas plumbing (Arrow batches in, explode-shaped
    output, integer-exact window math) is the real, tested part; at 100 TB
    it is one map-side pass, no shuffle.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k.name: [] for k in AUDIO_CHUNK_SCHEMA}
            for doc_id, payload in zip(pdf["doc_id"], pdf["blob"]):
                h = int(hashlib.md5(bytes(payload)).hexdigest()[:15], 16)
                rate = [16_000, 22_050, 44_100][h % 3]
                n_samples = h % 400_000 + 16_000
                per_chunk = rate * chunk_ms // 1_000
                n_chunks = (n_samples + per_chunk - 1) // per_chunk
                for i in range(n_chunks):
                    start = i * per_chunk
                    end = min(n_samples, start + per_chunk)
                    out["doc_id"].append(doc_id)
                    out["sample_rate"].append(rate)
                    out["chunk_idx"].append(i)
                    out["start_ms"].append(start * 1_000 // rate)
                    out["end_ms"].append(end * 1_000 // rate)
                    out["chunk_samples"].append(end - start)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "sample_rate": pd.Series(out["sample_rate"], dtype="int32"),
                    "chunk_idx": pd.Series(out["chunk_idx"], dtype="int32"),
                    "start_ms": pd.Series(out["start_ms"], dtype="int64"),
                    "end_ms": pd.Series(out["end_ms"], dtype="int64"),
                    "chunk_samples": pd.Series(out["chunk_samples"], dtype="int64"),
                }
            )

    return blobs.mapInPandas(gen, AUDIO_CHUNK_SCHEMA)


def multimodal_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return chunk_audio(attach_binary(docs)).orderBy("doc_id", "chunk_idx")


MULTIMODAL_AUDIO_SQL = f"""
WITH base AS (
    SELECT doc_id,
           ([16000, 22050, 44100])[{_H} % 3 + 1] AS rate,
           {_H} % 400000 + 16000 AS n_samples
    FROM documents
),
sized AS (
    SELECT doc_id, rate, n_samples,
           rate * {AUDIO_CHUNK_MS} // 1000 AS per_chunk
    FROM base
)
SELECT doc_id,
       rate::INTEGER AS sample_rate,
       i::INTEGER AS chunk_idx,
       CAST(i * per_chunk * 1000 // rate AS BIGINT) AS start_ms,
       CAST(LEAST(n_samples, (i + 1) * per_chunk) * 1000 // rate AS BIGINT)
           AS end_ms,
       CAST(LEAST(n_samples, (i + 1) * per_chunk) - i * per_chunk AS BIGINT)
           AS chunk_samples
FROM sized,
     LATERAL (SELECT unnest(range(0, (n_samples + per_chunk - 1) // per_chunk))
              AS i)
ORDER BY doc_id, chunk_idx
"""


# --------------------------------------------------------------------------
# Shot-boundary detection (windowed analytics over UDF-sampled frames)
# --------------------------------------------------------------------------

_SHOT_SIG_MOD = 1000   # per-frame scalar signature domain
_SHOT_CUT = 400        # |Δsignature| above this = new shot


def multimodal_shot_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot segmentation per video: a scalar per-frame signature (stub for
    a color-histogram/embedding distance), LAG-diff per video, boundary
    where the jump exceeds the cut — the canonical video-curation step
    (split on shots, then dedup/caption per shot, not per raw video).

    The interesting part is the SHAPE: an Arrow-batched mapInPandas stage
    (frame sampling, variable fan-out) feeding windowed analytics — UDF
    output is a first-class relation, windows partition by video (even
    keying), and the per-video rollup is map-side combined.  The decode
    stub is the documented deterministic fake; a real pyav decoder slots
    into the same pipeline unchanged.
    """
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    frames = sample_frames(attach_binary(docs))
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    sig = F.pmod(F.col("frame_hash"), F.lit(_SHOT_SIG_MOD))
    diffed = frames.select(
        "doc_id", "frame_idx", sig.alias("sig")
    ).withColumn("prev_sig", F.lag("sig").over(w))
    boundary = F.when(
        F.col("prev_sig").isNull()
        | (F.abs(F.col("sig") - F.col("prev_sig")) > _SHOT_CUT),
        1,
    ).otherwise(0)
    marked = diffed.withColumn("is_bound", boundary)
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.sum("is_bound").cast("bigint").alias("n_shots"),
            F.concat_ws(
                ",",
                F.sort_array(
                    F.collect_list(
                        F.when(F.col("is_bound") == 1, F.col("frame_idx"))
                    )
                ),
            ).alias("shot_starts"),
        )
        .orderBy("doc_id")
    )


MULTIMODAL_SHOTS_SQL = f"""
WITH frames AS ({MULTIMODAL_FRAMES_SQL.replace("ORDER BY doc_id, frame_idx", "")}),
diffed AS (
    SELECT doc_id, frame_idx,
           frame_hash % {_SHOT_SIG_MOD} AS sig,
           LAG(frame_hash % {_SHOT_SIG_MOD}) OVER (
               PARTITION BY doc_id ORDER BY frame_idx) AS prev_sig
    FROM frames
),
marked AS (
    SELECT doc_id, frame_idx,
           CASE WHEN prev_sig IS NULL OR ABS(sig - prev_sig) > {_SHOT_CUT}
                THEN 1 ELSE 0 END AS is_bound
    FROM diffed
)
SELECT doc_id,
       COUNT(*) AS n_frames,
       CAST(SUM(is_bound) AS BIGINT) AS n_shots,
       COALESCE(string_agg(CASE WHEN is_bound = 1 THEN frame_idx::VARCHAR END,
                           ',' ORDER BY frame_idx), '') AS shot_starts
FROM marked
GROUP BY doc_id
ORDER BY doc_id
"""
