"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas iterators.

The Spark-side machinery is real and tested — schemas, partition-sized
batch iteration via ``mapInPandas``, deterministic batch shapes — while the
actual media decoding is stubbed (the image/audio codecs are not available
in this environment): ``decode=`` accepts any per-cell function, the
default ``fake_feature_extractor`` derives deterministic pseudo-features
from the bytes so tests can assert end-to-end behavior.

THE CODEC SWAP, in one place: to go real, pass ``decode=`` (signature
``(payload: bytes, media_type: str) -> list[float]``) to
:func:`extract_features` and/or ``resize=`` (``(payload, w, h, tw, th) ->
bytes``) to :func:`resize_images` — e.g. a PIL/torchaudio/pyav-backed
callable. Nothing else changes: the contract tests in
tests/test_multimodal.py pin that ANY injected callable keeps the output
schema, runs with no shuffle upstream of the Python stage (payload never
moves), and survives adversarial payloads (empty/truncated/None bytes).

Scale notes: media bytes dominate row size, so operators here
(1) keep the binary column out of shuffles — features are computed in a
map-only stage before any wide operation, (2) iterate Arrow batches (no
per-row Python), and (3) support fixed-size batch control via
``spark.sql.execution.arrow.maxRecordsPerBatch`` for memory-bounded decode.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: canonical multimodal asset schema: opaque payload + typed metadata
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # 'image' | 'audio' | 'video'
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("codec", T.StringType()),
    ]
)

FEATURE_DIM = 8

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def real_decode(payload: bytes, media_type: str):  # pragma: no cover - env stub
    """Placeholder for the codec-backed decode path (PIL / torchaudio /
    pyav are not installed in this environment)."""
    raise NotImplementedError(
        "media codecs unavailable in this environment; pass decode="
        "fake_feature_extractor or a custom callable"
    )


def content_hash(payload: bytes | None) -> str:
    """Deterministic content digest: SHA-256 over the payload's lowercase hex
    encoding. Hashing the hex (rather than the raw bytes) keeps the digest
    reproducible by SQL oracles whose hash functions only accept text."""
    return hashlib.sha256((payload or b"").hex().encode("ascii")).hexdigest()


def fake_feature_extractor(payload: bytes, media_type: str) -> list[float]:
    """Deterministic stand-in for a model feature extractor: FEATURE_DIM
    floats derived from the content hash of the bytes (stable across
    runs/engines; the digest doubles as the cross-engine oracle anchor)."""
    h = bytes.fromhex(content_hash(payload))
    return [
        int.from_bytes(h[2 * i : 2 * i + 2], "big") / 65535.0 for i in range(FEATURE_DIM)
    ]


def extract_features(
    assets: DataFrame,
    decode: Callable[[bytes, str], list[float]] = fake_feature_extractor,
) -> DataFrame:
    """Map-only Arrow-batched feature extraction over the binary column.

    The returned frame drops the payload — downstream joins/apps shuffle
    only ids + features, never media bytes.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                    "content_hash": payloads.map(content_hash),
                    "features": [
                        decode(b, m) for b, m in zip(payloads, pdf["media_type"])
                    ],
                }
            )

    return assets.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (asset, sample timestamp).

    The expansion is pure relational (sequence + explode) — the decode of
    each sampled frame would run in extract_features afterward. Keeps the
    planning JVM-side; only sampled frames ever hit Python.
    """
    return (
        assets.filter(F.col("media_type") == "video")
        .select(
            "asset_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
            ).alias("sample_ms"),
        )
    )


def audio_segment_plan(
    assets: DataFrame, segment_ms: int = 2000, hop_ms: int = 1000
) -> DataFrame:
    """Audio segmentation *plan*: one row per (asset, window) for
    fixed-length overlapping windows — ``segment_ms`` long every
    ``hop_ms`` (hop < segment ⇒ overlap), the standard shape for audio
    feature extraction. Pure relational (sequence + explode), mirroring
    :func:`frame_sample_plan`; only planned segments would ever hit a
    decoder. When the duration isn't hop-aligned, a final window anchored
    at ``duration − segment`` guarantees the tail is covered (full-length,
    overlapping the previous window — the usual inference convention);
    audio shorter than one segment yields a single partial window.
    """
    dur = F.col("duration_ms")
    last_start = F.greatest(dur - F.lit(segment_ms), F.lit(0))
    # aligned starts 0, hop, 2·hop, … ≤ last_start, plus the tail anchor
    starts = F.array_distinct(
        F.concat(F.sequence(F.lit(0), last_start, F.lit(hop_ms)), F.array(last_start))
    )
    return (
        assets.filter(F.col("media_type") == "audio")
        .select("asset_id", dur.alias("duration_ms"), F.explode(starts).alias("start_ms"))
        .select(
            "asset_id",
            "start_ms",
            F.least(F.col("start_ms") + F.lit(segment_ms), F.col("duration_ms")).alias("end_ms"),
        )
    )


def synthesize_assets(spark, n: int = 64) -> DataFrame:
    """Deterministic fake asset table for tests (payload = seeded bytes).

    Built as a pure-JVM plan over ``spark.range`` — payload bytes derive
    from ``sha2`` in the JVM (identical to the former Python
    ``hashlib.sha256(f"asset{i}").digest() * (i % 5 + 1)``), so no
    Python-backed local relation rides into downstream actions.
    """
    i = F.col("id")
    mt = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (i % 3).cast("int") + F.lit(1)
    )
    hex_payload = F.expr("repeat(sha2(concat('asset', cast(id as string)), 256), cast(id % 5 + 1 as int))")
    is_image = mt == "image"
    # size partitions to the row count (≥32 rows per Arrow batch): a tiny
    # asset table split across every core pays one Python-worker round-trip
    # per near-empty partition in downstream mapInPandas stages — task
    # overhead, not compute, dominated the measured time
    n_parts = max(1, min(spark.sparkContext.defaultParallelism, n // 32))
    return spark.range(0, n, 1, n_parts).select(
        i.alias("asset_id"),
        mt.alias("media_type"),
        F.unhex(hex_payload).alias("payload"),
        F.when(is_image, (F.lit(64) + i).cast("int")).alias("width"),
        F.when(is_image, (F.lit(48) + i).cast("int")).alias("height"),
        F.when(~is_image, (F.lit(1000) * ((i % 7).cast("int") + F.lit(1))).cast("int")).alias(
            "duration_ms"
        ),
        F.element_at(
            F.create_map(
                F.lit("image"), F.lit("png"),
                F.lit("audio"), F.lit("pcm"),
                F.lit("video"), F.lit("h264"),
            ),
            mt,
        ).alias("codec"),
    )


def fake_resize(payload: bytes, width: int | None, height: int | None,
                target_w: int, target_h: int) -> bytes:
    """Deterministic stand-in for a codec-backed image resize (codecs are
    not installed here): the 'resized' payload is the SHA-256 digest of the
    original payload's hex encoding concatenated with the target geometry —
    stable across runs/engines, so SQL oracles can replay it from text."""
    seed = (payload or b"").hex() + f"x{target_w}x{target_h}"
    return hashlib.sha256(seed.encode("ascii")).digest()


def resize_images(
    assets: DataFrame,
    target_w: int,
    target_h: int,
    resize: Callable[[bytes, int | None, int | None, int, int], bytes] = fake_resize,
) -> DataFrame:
    """Arrow-batched image resize over the binary column (map-only).

    Only image assets are transformed; the decode/re-encode runs inside a
    ``mapInPandas`` iterator so media bytes never leave the map stage —
    the returned frame carries the new payload plus before/after geometry
    for downstream bookkeeping. Aspect-preserving fit in EXACT integer
    arithmetic (floor, never upscale): width-bound → (tw, h·tw div w),
    height-bound → (w·th div h, th) — float scaling would make the output
    geometry depend on engine rounding, breaking cross-engine oracles.
    ``resize`` accepts any per-cell callable; the default is the
    deterministic env stub (real codecs unavailable — see fake_resize).
    """
    out_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType()),
            T.StructField("old_width", T.IntegerType()),
            T.StructField("old_height", T.IntegerType()),
            T.StructField("new_width", T.IntegerType()),
            T.StructField("new_height", T.IntegerType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, w, h, payload in zip(
                pdf["asset_id"], pdf["width"], pdf["height"], pdf["payload"]
            ):
                w = None if pd.isna(w) else int(w)
                h = None if pd.isna(h) else int(h)
                if w and h:
                    if w <= target_w and h <= target_h:
                        nw, nh = w, h
                    elif w * target_h >= h * target_w:  # width-bound
                        nw, nh = target_w, max(1, h * target_w // w)
                    else:  # height-bound
                        nw, nh = max(1, w * target_h // h), target_h
                else:
                    nw, nh = target_w, target_h
                rows.append((aid, w, h, nw, nh, resize(payload, w, h, nw, nh)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "old_width", "old_height",
                    "new_width", "new_height", "payload",
                ],
            )

    return assets.filter(F.col("media_type") == "image").mapInPandas(run, out_schema)
