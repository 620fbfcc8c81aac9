"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched ``mapInPandas``
operators. The Spark-side plumbing — schemas, partitioning, UDF
signatures, batch shapes — is real and tested; the actual codecs
(PIL/ffmpeg-class decode) are NOT in this container, so the decode
kernel is stubbed behind ``decode_media`` (NotImplementedError) with
``fake_decode_media`` as the deterministic test double. Swapping the
real codec in changes one function, not the plan.

Design for 100 TB of media:
* bytes stay in the JVM until the one Arrow hop into the decode UDF;
  nothing is collected or exploded row-at-a-time.
* ``mapInPandas`` (not a scalar UDF) so a batch can yield 0..N output
  rows per input (frame sampling) and amortizes codec setup per batch.
* feature vectors come back as ``array<float>`` ready for the
  similarity operators (operators.similarity / operators.dedupe).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16


def synthetic_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media rows: payload = repeated md5 bytes,
    metadata derived from hashes. No external data, fully distributed."""
    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    kind = F.element_at(kinds, (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(3)) + 1).cast("int"))
    # repeat() coerces binary->string, so repeat the HEX then unhex once
    payload = F.unhex(F.repeat(F.md5(F.concat(F.col("id").cast("string"), F.lit(seed))), 64))
    width = (F.pmod(F.xxhash64("id", F.lit("w")), F.lit(1920)) + 16).cast("int")
    height = (F.pmod(F.xxhash64("id", F.lit("h")), F.lit(1080)) + 16).cast("int")
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("bytes"),
        F.struct(
            F.lit("synthetic/v1").alias("format"),
            width.alias("width"),
            height.alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.pmod(F.xxhash64("id", F.lit("d")), F.lit(120_000)) + 1000).cast("int").alias("duration_ms"),
            (F.pmod(F.xxhash64("id", F.lit("f")), F.lit(300)) + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def decode_media(raw: bytes, fmt: str) -> np.ndarray:
    """REAL-CODEC STUB: this container ships no image/audio libraries.
    Production swaps this for PIL.Image.open / soundfile / pyav."""
    raise NotImplementedError(
        "media codecs (PIL/soundfile/pyav) are not installed in this environment; "
        "use fake_decode_media for deterministic tests"
    )


def fake_decode_media(raw: bytes, fmt: str) -> np.ndarray:
    """Deterministic test double: interpret payload bytes as uint8."""
    return np.frombuffer(raw, dtype=np.uint8)


FEATURES_OUT = "media_id long, kind string, feature array<float>, n_bytes long"


def extract_features(df: DataFrame, decoder=fake_decode_media) -> DataFrame:
    """binary -> FEATURE_DIM float vector per media row (byte-bucket
    histogram over the decoded sample — a stand-in embedding with the
    exact batch shape a CLIP/wav2vec encoder batch would have)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        edges = np.linspace(0, 256, FEATURE_DIM + 1)
        for pdf in batches:
            feats, nb = [], []
            for raw, fmt in zip(pdf["bytes"], pdf["fmt"]):
                arr = decoder(raw, fmt)
                hist, _ = np.histogram(arr, bins=edges)
                s = hist.sum() or 1
                feats.append((hist / s).astype(np.float32))
                nb.append(len(raw))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "n_bytes": nb,
                }
            )

    src = df.select("media_id", "kind", "bytes", F.col("meta.format").alias("fmt"))
    return src.mapInPandas(run, FEATURES_OUT)


COUNTS_OUT = "media_id long, kind string, n_bytes long, " + ", ".join(
    f"b{i} long" for i in range(FEATURE_DIM)
)


def extract_feature_counts(df: DataFrame, decoder=fake_decode_media) -> DataFrame:
    """`extract_features`' histogram as UN-normalized integer bucket
    counts in FEATURE_DIM scalar columns — the driver-canonicalizable /
    oracle-checkable projection of the same decode pass (float arrays
    crash the harness's pandas sort and never hash bit-stably)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        edges = np.linspace(0, 256, FEATURE_DIM + 1)
        for pdf in batches:
            hists, nb = [], []
            for raw, fmt in zip(pdf["bytes"], pdf["fmt"]):
                arr = decoder(raw, fmt)
                hist, _ = np.histogram(arr, bins=edges)
                hists.append(hist.astype(np.int64))
                nb.append(len(raw))
            out = {"media_id": pdf["media_id"], "kind": pdf["kind"], "n_bytes": nb}
            cols = np.array(hists) if hists else np.zeros((0, FEATURE_DIM), dtype=np.int64)
            for i in range(FEATURE_DIM):
                out[f"b{i}"] = cols[:, i]
            yield pd.DataFrame(out)

    src = df.select("media_id", "kind", "bytes", F.col("meta.format").alias("fmt"))
    return src.mapInPandas(run, COUNTS_OUT)


RESIZE_OUT = "media_id long, width int, height int, bytes binary"


def resize_images(df: DataFrame, max_side: int = 224, decoder=fake_decode_media) -> DataFrame:
    """Image resize plumbing: computes the target geometry JVM-side
    (cheap math stays out of Python), ships only image rows through
    Arrow, re-emits binary. The pixel resample itself is the stubbed
    codec step (here: byte truncation proportional to area ratio)."""
    imgs = df.filter(F.col("kind") == "image").select(
        "media_id",
        "bytes",
        F.col("meta.width").alias("w"),
        F.col("meta.height").alias("h"),
    )
    scale = F.least(F.lit(1.0), F.lit(max_side) / F.greatest("w", "h"))
    imgs = imgs.withColumn("tw", (F.col("w") * scale).cast("int")).withColumn(
        "th", (F.col("h") * scale).cast("int")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_bytes = []
            for raw, w, h, tw, th in zip(pdf["bytes"], pdf["w"], pdf["h"], pdf["tw"], pdf["th"]):
                ratio = (tw * th) / max(w * h, 1)
                keep = max(int(len(raw) * ratio), 1)
                out_bytes.append(bytes(raw[:keep]))  # stub resample
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pdf["tw"].astype("int32"),
                    "height": pdf["th"].astype("int32"),
                    "bytes": out_bytes,
                }
            )

    return imgs.mapInPandas(run, RESIZE_OUT)


FRAMES_OUT = "media_id long, frame_idx int, frame_ms int, bytes binary"


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling: 1..N output rows per input row (the shape
    a real keyframe extractor has). Frame timestamps derive from the
    typed metadata; frame payloads are stubbed byte slices."""
    vids = df.filter(F.col("kind") == "video").select(
        "media_id", "bytes", F.col("meta.n_frames").alias("nf"), F.col("meta.duration_ms").alias("dur")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "frame_ms": [], "bytes": []}
            for mid, raw, nf, dur in zip(pdf["media_id"], pdf["bytes"], pdf["nf"], pdf["dur"]):
                for i in range(0, int(nf), every_n):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["frame_ms"].append(int(i * dur / max(nf, 1)))
                    off = (i * 37) % max(len(raw) - 16, 1)
                    rows["bytes"].append(bytes(raw[off : off + 16]))  # stub frame
            yield pd.DataFrame(rows).astype(
                {"frame_idx": "int32", "frame_ms": "int32"}, errors="ignore"
            )

    return vids.mapInPandas(run, FRAMES_OUT)
