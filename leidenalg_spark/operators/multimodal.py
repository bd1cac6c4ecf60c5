"""Multimodal column plumbing (prescribed first-class op).

Images/audio/video are opaque ``binary`` columns with typed metadata.
The Spark-side machinery — schema, batch shape, ``mapInPandas``
signatures, partitioning — is real and tested; the actual codec step is
STUBBED (this container ships no image/audio libraries): by default a
deterministic fake featureizer runs, and ``decode_real=True`` raises
``NotImplementedError`` at the exact point a PIL/ffmpeg call would go.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("checksum", LongType(), False),
        StructField("feature", ArrayType(FloatType()), False),
    ]
)


def synthetic_media(spark, n=200, seed=42) -> DataFrame:
    """Deterministic fake media table: payload bytes derived from the id
    (stands in for real blobs; sizes vary to exercise batch shaping)."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(3)) + 1).cast("int"),
        ).alias("media_type"),
        F.encode(
            F.repeat(F.hex(F.xxhash64("id", F.lit(seed + 1))), (F.pmod(F.xxhash64("id", F.lit(seed + 2)), F.lit(64)) + 1).cast("int")),
            "utf-8",
        ).alias("payload"),
        (F.pmod(F.xxhash64("id", F.lit(seed + 3)), F.lit(1920)) + 16).alias("width"),
        (F.pmod(F.xxhash64("id", F.lit(seed + 4)), F.lit(1080)) + 16).alias("height"),
        (F.pmod(F.xxhash64("id", F.lit(seed + 5)), F.lit(60000)) + 100).alias("duration_ms"),
    )
    return df


def available_decoders() -> dict:
    """Which real media decoders this environment can import — the
    optional-extra gate for ``decode_real=True`` (PIL for images, soundfile
    or the stdlib ``wave`` RIFF reader for audio, PyAV for video).  Import
    probes only; nothing is decoded here."""
    d = {}
    try:
        import PIL.Image  # noqa: F401

        d["image"] = "pillow"
    except ImportError:
        pass
    try:
        import soundfile  # noqa: F401

        d["audio"] = "soundfile"
    except ImportError:
        d["audio"] = "wave"  # stdlib: RIFF/WAV payloads only
    try:
        import av  # noqa: F401

        d["video"] = "pyav"
    except ImportError:
        pass
    return d


def _moments(arr: np.ndarray) -> np.ndarray:
    """8 deterministic moments of a 1-D sample array (shared by the fake
    and the real featureizers so downstream schema/consumers never care
    which decoder produced a row)."""
    if len(arr) == 0:
        arr = np.zeros(1)
    return np.array(
        [
            arr.mean(),
            arr.std(),
            arr.min(),
            arr.max(),
            float(len(arr)),
            float(arr.sum() % 997),
            float((arr[::2].sum() if len(arr) else 0) % 991),
            float((arr[1::2].sum() if len(arr) > 1 else 0) % 983),
        ],
        dtype=np.float32,
    )


def _decode_real(payload: bytes, media_type: str, decoders: dict) -> np.ndarray:
    impl = decoders.get(media_type)
    if impl is None:
        raise NotImplementedError(
            f"no decoder importable for media_type={media_type!r} "
            "(install pillow for images / pyav for video), or use "
            "decode_real=False for the deterministic fake featureizer"
        )
    import io

    if media_type == "image":  # impl == "pillow"
        import PIL.Image

        img = PIL.Image.open(io.BytesIO(payload)).convert("L").resize((8, 8))
        px = np.asarray(img, dtype=np.float64).ravel() / 255.0
        # uniform 8-dim output across every media type and the fake
        # featureizer — a mixed corpus must never yield ragged feature
        # arrays (distance/centroid consumers assume one fixed dimension).
        # Deliberate tradeoff: dropping the raw 8x8 thumbnail loses some
        # pixel-layout discrimination (the stride-sum moments keep only
        # partial permutation sensitivity); callers needing pixel-exact
        # separation should hash the payload, not the feature vector.
        return _moments(px)
    if media_type == "audio":
        if impl == "soundfile":
            import soundfile

            samples, _sr = soundfile.read(io.BytesIO(payload), dtype="float64")
            samples = np.atleast_2d(samples).mean(axis=-1).ravel()
        else:  # stdlib wave: 16-bit PCM RIFF/WAV
            import wave

            with wave.open(io.BytesIO(payload)) as w:
                raw = w.readframes(w.getnframes())
            samples = np.frombuffer(raw, dtype=np.int16).astype(np.float64) / 32768.0
        return _moments(samples)
    # video / pyav: first-frame luma moments
    import av

    with av.open(io.BytesIO(payload)) as container:
        frame = next(container.decode(video=0))
        px = frame.to_ndarray(format="gray").astype(np.float64).ravel() / 255.0
    return _moments(px)


def _decode_stub(payload: bytes, media_type: str, decode_real: bool, decoders=None) -> np.ndarray:
    if decode_real:
        return _decode_real(payload or b"", media_type, decoders or {})
    # deterministic fake feature: 8 moments of the byte distribution
    arr = np.frombuffer(payload or b"\x00", dtype=np.uint8).astype(np.float64)
    return _moments(arr)


def extract_features(media: DataFrame, decode_real: bool = False, batch_size: int = 256) -> DataFrame:
    """Decode/feature-extract via ``mapInPandas`` — Arrow batches in,
    Arrow batches out; the per-batch loop is NumPy over byte buffers,
    never per-row Python object churn in the plan itself.

    ``decode_real=True`` uses whatever decoders this environment can
    import (:func:`available_decoders`: pillow / soundfile / stdlib wave /
    pyav); a media_type with no importable decoder raises
    ``NotImplementedError`` at task time.  The decoder table is resolved
    ONCE on the driver and ships with the closure, so availability is
    decided where the job is launched, not per executor."""
    decoders = available_decoders() if decode_real else None

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_stub(p, t, decode_real, decoders) for p, t in zip(pdf["payload"], pdf["media_type"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                    "checksum": [int(np.frombuffer(p or b"\x00", dtype=np.uint8).sum()) for p in pdf["payload"]],
                    "feature": [f.tolist() for f in feats],
                }
            )

    return media.mapInPandas(gen, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per planned frame timestamp
    (the decode itself is the stubbed step).  Pure JVM explode."""
    vids = media.where(F.col("media_type") == "video")
    ts = F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
    return vids.select("media_id", F.explode(ts).alias("frame_ms"))


def media_dedup(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Exact media deduplication on the opaque binary column: md5 of the
    raw payload bytes (codec-free — identical files dedup regardless of
    whether a decoder exists in the environment), smallest ``media_id``
    kept per group, the :func:`leidenalg_spark.operators.dedup.
    dedup_exact` contract ported to binary.  NULL payloads fingerprint
    as the empty blob so they group together instead of vanishing from
    the equi-join.  Returns (media_id, media_type, content_hash,
    group_size, is_kept).

    Scale shape: one hash-groupBy on the 16-byte digest (map-side
    combinable — the petabyte of payload bytes never shuffles, only
    digests do) + one broadcast-sized keep-id attach.
    """
    h = F.md5(F.coalesce(F.col(payload_col), F.lit(b"")))
    with_fp = media.select("media_id", "media_type", h.alias("content_hash"))
    grp = with_fp.groupBy("content_hash").agg(
        F.min("media_id").alias("keep_id"), F.count(F.lit(1)).alias("group_size")
    )
    return with_fp.join(grp, "content_hash").select(
        "media_id", "media_type", "content_hash", "group_size",
        (F.col("media_id") == F.col("keep_id")).alias("is_kept"),
    )


def media_byte_shingles(media: DataFrame, k: int = 8, payload_col: str = "payload",
                        id_col: str = "media_id") -> DataFrame:
    """Distinct byte k-gram shingles of the raw payload — the codec-free
    unit of media NEAR-dup detection (exact dedup hashes whole blobs;
    re-encoded-with-appended-metadata copies need window overlap).
    Computed on the hex encoding (2 chars/byte, byte-aligned steps) so
    the whole shingler is JVM string expressions, portable to SQL, and
    never ships payload bytes through Python.  Returns (doc_id, shingle).
    """
    hx = F.lower(F.hex(F.coalesce(F.col(payload_col), F.lit(b""))))
    n = 2 * k
    idx = F.sequence(F.lit(0), F.greatest(F.length(hx) - n, F.lit(0)), F.lit(2))
    sh = F.transform(idx, lambda i: hx.substr(i + 1, F.lit(n)))
    return (
        media.select(F.col(id_col).alias("doc_id"), F.explode(F.array_distinct(sh)).alias("shingle"))
        .where(F.length("shingle") > 0)
    )


def media_neardup_pairs(
    media: DataFrame, k: int = 8, num_hashes: int = 16, bands: int = 4,
    threshold: float = 0.5, payload_col: str = "payload", id_col: str = "media_id",
) -> DataFrame:
    """Near-duplicate media pairs (a < b, byte-shingle Jaccard ≥
    threshold) via the shared MinHash+LSH machinery of
    :mod:`leidenalg_spark.operators.dedup` over :func:`media_byte_shingles`
    — banded candidate generation (equality joins, linear shuffle), then
    EXACT Jaccard verification on the candidates only.  The companion to
    :func:`media_dedup` for payloads that differ by a few bytes
    (truncated tails, appended metadata) rather than not at all.

    Scale shape: shingle explode + the dedup module's banded join;
    verification joins shingle sets only for candidate pairs, never
    all-pairs; payload bytes themselves never shuffle — 16-char hex
    windows do.
    """
    from .dedup import minhash_lsh_candidates, minhash_signatures

    sh = media_byte_shingles(media, k, payload_col, id_col).persist()
    sig = minhash_signatures(media.select(F.col(id_col).alias("doc_id")),
                             num_hashes=num_hashes, _sh=sh)
    cand = minhash_lsh_candidates(sig, bands=bands)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    inter = (
        cand.join(sh.select(F.col("doc_id").alias("a"), "shingle"), "a")
        .join(sh.select(F.col("doc_id").alias("b"), "shingle"), ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    out = (
        inter.join(sizes.select(F.col("doc_id").alias("a"), F.col("n_sh").alias("na")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("n_sh").alias("nb")), "b")
        .select(
            "a", "b",
            F.round(
                F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")), 6
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
        .localCheckpoint(eager=True)
    )
    sh.unpersist()
    return out
