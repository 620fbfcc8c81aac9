"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched ``mapInPandas``
operators. The Spark-side plumbing — schemas, partitioning, UDF
signatures, batch shapes — is real and tested, and so is the decode
path for the formats a pure-numpy codec can carry: binary PPM (P6)
images, PCM16 WAV audio, and a concatenated-PPM frame sequence for
video (``video/ppmseq``). Compressed formats (JPEG/MP4-class) remain
the documented codec boundary — ``decode_media`` raises
NotImplementedError for them; production swaps in PIL/pyav there
without touching any plan. ``fake_decode_media`` stays as the
fastest deterministic double for plumbing-only tests.

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


def synthetic_media(
    spark: SparkSession, n: int, seed: int = 42, real: bool = True
) -> DataFrame:
    """Deterministic synthetic media rows. ``real=True`` (default)
    emits ACTUAL container bytes — binary PPM images, PCM16 WAV audio,
    concatenated-PPM video — generated per-row from a seeded RNG in an
    Arrow batch (the decode path is load-bearing end to end).
    ``real=False`` is the fast JVM-only payload (repeated md5 bytes,
    format 'synthetic/v1') for plumbing-speed tests. No external data,
    fully distributed either way."""
    if not real:
        kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
        kind = F.element_at(
            kinds, (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(3)) + 1).cast("int")
        )
        # repeat() coerces binary->string, so repeat the HEX then unhex once
        payload = F.unhex(
            F.repeat(F.md5(F.concat(F.col("id").cast("string"), F.lit(seed))), 64)
        )
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
                (F.pmod(F.xxhash64("id", F.lit("d")), F.lit(120_000)) + 1000)
                .cast("int")
                .alias("duration_ms"),
                (F.pmod(F.xxhash64("id", F.lit("f")), F.lit(300)) + 1)
                .cast("int")
                .alias("n_frames"),
            ).alias("meta"),
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rate = 16000
        for pdf in batches:
            rows = {
                "media_id": [], "kind": [], "bytes": [],
                "format": [], "width": [], "height": [],
                "sample_rate": [], "duration_ms": [], "n_frames": [],
            }
            for mid in pdf["id"]:
                rng = np.random.default_rng(seed * 1_000_003 + int(mid))
                kind = ("image", "audio", "video")[int(mid) % 3]
                w = h = sr = dur = nf = None
                if kind == "image":
                    w, h = int(rng.integers(16, 64)), int(rng.integers(16, 64))
                    raw = encode_ppm(
                        rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
                    )
                    fmt = "image/ppm"
                elif kind == "audio":
                    sr, dur = rate, int(rng.integers(50, 150))
                    samples = rng.integers(
                        -32768, 32768, size=sr * dur // 1000, dtype=np.int16
                    )
                    raw = encode_wav(samples, sr)
                    fmt = "audio/wav"
                else:
                    nf, dur = int(rng.integers(1, 30)), int(rng.integers(1000, 5000))
                    w = h = 4
                    raw = b"".join(
                        encode_ppm(
                            rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
                        )
                        for _ in range(nf)
                    )
                    fmt = "video/ppmseq"
                rows["media_id"].append(int(mid))
                rows["kind"].append(kind)
                rows["bytes"].append(raw)
                rows["format"].append(fmt)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["sample_rate"].append(sr)
                rows["duration_ms"].append(dur)
                rows["n_frames"].append(nf)
            yield pd.DataFrame(rows)

    flat = spark.range(n).mapInPandas(
        gen,
        "media_id long, kind string, bytes binary, format string, width int, "
        "height int, sample_rate int, duration_ms int, n_frames int",
    )
    return flat.select(
        "media_id",
        "kind",
        "bytes",
        F.struct(
            "format", "width", "height", "sample_rate", "duration_ms", "n_frames"
        ).alias("meta"),
    )


# ---------------------------------------------------------------- codecs
#
# Pure-numpy codecs for uncompressed container formats. These are REAL
# parsers (header validation, geometry, byte layout), not doubles: a
# corrupt payload raises, a valid one round-trips bit-exactly.

PPM_MAGIC = b"P6"


def encode_ppm(pixels: np.ndarray) -> bytes:
    """HxWx3 uint8 -> binary PPM (P6)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError(f"expected HxWx3 uint8, got {pixels.shape} {pixels.dtype}")
    h, w, _ = pixels.shape
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def decode_ppm(raw: bytes) -> np.ndarray:
    """Binary PPM (P6) -> HxWx3 uint8."""
    if not raw.startswith(PPM_MAGIC):
        raise ValueError("not a P6 PPM payload")
    # header = magic, width, height, maxval as whitespace-separated
    # tokens; pixel data starts after the single whitespace byte that
    # terminates maxval
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(raw) and raw[pos : pos + 1].isspace():
            pos += 1
        start = pos
        while pos < len(raw) and not raw[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        tokens.append(int(raw[start:pos]))
    pos += 1  # the one whitespace after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    need = w * h * 3
    body = raw[pos : pos + need]
    if len(body) != need:
        raise ValueError(f"PPM body holds {len(body)} bytes, header says {need}")
    return np.frombuffer(body, dtype=np.uint8).reshape(h, w, 3)


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """1-D int16 -> PCM16 mono WAV (RIFF)."""
    if samples.ndim != 1 or samples.dtype != np.int16:
        raise ValueError(f"expected 1-D int16, got {samples.shape} {samples.dtype}")
    import struct

    data = samples.tobytes()
    byte_rate = sample_rate * 2
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, sample_rate, byte_rate, 2, 16,
        b"data", len(data),
    )
    return hdr + data


def decode_wav(raw: bytes) -> tuple[np.ndarray, int]:
    """PCM16 mono WAV -> (samples int16, sample_rate)."""
    import struct

    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    rate, samples = None, None
    while pos + 8 <= len(raw):
        cid, sz = raw[pos : pos + 4], struct.unpack("<I", raw[pos + 4 : pos + 8])[0]
        body = raw[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt_tag, ch, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if fmt_tag != 1 or ch != 1 or bits != 16:
                raise ValueError("only PCM16 mono supported")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype=np.int16)
        pos += 8 + sz + (sz & 1)
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return samples, rate


def split_ppmseq(raw: bytes) -> list[bytes]:
    """``video/ppmseq`` container -> list of per-frame PPM payloads.
    Frames are self-delimiting (each header states its own body size),
    so the split is a linear header walk — no index needed."""
    frames, pos = [], 0
    while pos < len(raw):
        if raw[pos : pos + 2] != PPM_MAGIC:
            raise ValueError(f"garbage at offset {pos} of ppmseq")
        frame = decode_ppm(raw[pos:])
        h, w, _ = frame.shape
        # re-derive this frame's total length: header + body
        hdr_len = raw.index(b"\n255\n", pos) + 5 - pos
        flen = hdr_len + w * h * 3
        frames.append(raw[pos : pos + flen])
        pos += flen
    return frames


def decode_media(raw: bytes, fmt: str) -> np.ndarray:
    """Decode a payload to a uint8 sample array suitable for byte-
    bucket features: PPM -> flat pixel bytes, WAV -> high bytes of the
    PCM16 samples shifted to unsigned, ppmseq -> all frames' pixels.
    Compressed formats are the REAL-CODEC BOUNDARY: this container
    ships no PIL/soundfile/pyav; production swaps them in here."""
    if fmt == "image/ppm":
        return decode_ppm(raw).reshape(-1)
    if fmt == "audio/wav":
        samples, _ = decode_wav(raw)
        return ((samples.astype(np.int32) >> 8) + 128).astype(np.uint8)
    if fmt == "video/ppmseq":
        parts = [decode_ppm(f).reshape(-1) for f in split_ppmseq(raw)]
        return np.concatenate(parts) if parts else np.zeros(0, dtype=np.uint8)
    if fmt == "image/jpeg":
        # REAL compressed codec: the pure-numpy baseline-JPEG decoder
        # (operators/jpeg.py — markers, Huffman, dequant, IDCT).
        # Progressive/subsampled streams raise NotImplementedError
        # there; that remains the PIL/libjpeg swap-in seam.
        from .jpeg import decode_jpeg

        return decode_jpeg(raw).reshape(-1)
    raise NotImplementedError(
        f"no codec for {fmt!r} in this environment (PIL/soundfile/pyav not "
        "installed); use image/ppm, image/jpeg (baseline), audio/wav, "
        "video/ppmseq, or fake_decode_media for plumbing tests"
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


def resize_images(df: DataFrame, max_side: int = 224) -> DataFrame:
    """Image resize: target geometry computed JVM-side (cheap math
    stays out of Python), only image rows ship through Arrow. PPM
    payloads get a REAL nearest-neighbor resample (decode -> integer
    index maps -> re-encode); other formats fall back to the byte-
    truncation stub (the compressed-codec boundary)."""
    imgs = df.filter(F.col("kind") == "image").select(
        "media_id",
        "bytes",
        F.col("meta.format").alias("fmt"),
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
            for raw, fmt, w, h, tw, th in zip(
                pdf["bytes"], pdf["fmt"], pdf["w"], pdf["h"], pdf["tw"], pdf["th"]
            ):
                if fmt == "image/ppm":
                    px = decode_ppm(raw)
                    sh, sw = px.shape[:2]
                    tw_, th_ = max(int(tw), 1), max(int(th), 1)
                    ys = (np.arange(th_) * sh) // th_
                    xs = (np.arange(tw_) * sw) // tw_
                    out_bytes.append(encode_ppm(px[ys][:, xs]))
                else:
                    ratio = (tw * th) / max(w * h, 1)
                    keep = max(int(len(raw) * ratio), 1)
                    out_bytes.append(bytes(raw[:keep]))  # stub resample
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pdf["tw"].astype("int32").clip(lower=1),
                    "height": pdf["th"].astype("int32").clip(lower=1),
                    "bytes": out_bytes,
                }
            )

    return imgs.mapInPandas(run, RESIZE_OUT)


FRAMES_OUT = "media_id long, frame_idx int, frame_ms int, bytes binary"


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling: 1..N output rows per input row (the shape
    a real keyframe extractor has). Frame timestamps derive from the
    typed metadata. ``video/ppmseq`` payloads emit REAL per-frame PPM
    bytes (container split + re-slice); other formats fall back to
    stubbed byte slices (the compressed-codec boundary)."""
    vids = df.filter(F.col("kind") == "video").select(
        "media_id",
        "bytes",
        F.col("meta.format").alias("fmt"),
        F.col("meta.n_frames").alias("nf"),
        F.col("meta.duration_ms").alias("dur"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "frame_ms": [], "bytes": []}
            for mid, raw, fmt, nf, dur in zip(
                pdf["media_id"], pdf["bytes"], pdf["fmt"], pdf["nf"], pdf["dur"]
            ):
                frames = split_ppmseq(bytes(raw)) if fmt == "video/ppmseq" else None
                for i in range(0, int(nf), every_n):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["frame_ms"].append(int(i * dur / max(nf, 1)))
                    if frames is not None:
                        rows["bytes"].append(frames[i])  # real PPM frame
                    else:
                        off = (i * 37) % max(len(raw) - 16, 1)
                        rows["bytes"].append(bytes(raw[off : off + 16]))  # stub
            yield pd.DataFrame(rows).astype(
                {"frame_idx": "int32", "frame_ms": "int32"}, errors="ignore"
            )

    return vids.mapInPandas(run, FRAMES_OUT)
