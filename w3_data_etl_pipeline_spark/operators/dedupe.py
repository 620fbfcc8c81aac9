"""Deduplication operators.

``latest_by_key`` is the CDC max-LSN dedup the north rule mandates
(one surviving event per (repo,path) per microbatch, deterministic
tie-break). The rest are the training-data dedup family: exact
hash dedup, MinHash+LSH, SimHash, n-gram Jaccard, and
embedding-cosine near-dup — each expressed with built-in DataFrame
ops (shuffles only on the grouping keys; no per-row Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def latest_by_key(df: DataFrame, keys: list[str], order: list[str]) -> DataFrame:
    """Keep the max-`order` row per key (last-writer-wins).

    Deterministic: ties on order[0] break on order[1], ...; exact
    duplicate rows collapse to one arbitrarily-but-identically.
    Generalizes the reference's "latest state wins" rebuild semantics
    (reference src/dags/w3c.py weekly DROP+rebuild) into streaming
    upsert form. Single shuffle on `keys`.
    """
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc_nulls_last() for c in order])
    return (
        df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact content dedup: keep min-id row per sha256(text).

    Hash-groupBy — one shuffle on the 64-hex digest, uniformly
    distributed, so no skew at any scale.
    """
    h = F.sha2(F.col(text_col), 256).alias("_h")
    w = Window.partitionBy("_h").orderBy(F.col(id_col).asc())
    return (
        df.withColumn("_h", F.sha2(F.col(text_col), 256))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_h", "_rn")
    )


# 2^31 - 1 (Mersenne prime): modulus for the universal-hash family
# h_i(x) = (a_i * H(x) + b_i) mod P over the 60-bit md5-prefix base
# hash. Both H and the affine family are exactly reproducible in
# DuckDB ('0x'||substr(md5(x),1,15) cast to BIGINT), which is what
# makes the MinHash/SimHash oracles possible — xxhash64 is not.
MINHASH_P = 2_147_483_647


def md5_hash60(c: F.Column) -> F.Column:
    """60-bit integer hash of a string column, dual-implementable:
    Spark `conv(substr(md5(x),1,15),16,10)` == DuckDB
    `('0x'||substr(md5(x),1,15))::BIGINT` (verified bit-equal)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def minhash_params(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) coefficients for the affine hash
    family, from a fixed-seed LCG — inlined identically into the
    DuckDB oracle SQL."""
    params, x = [], 1_234_567
    for _ in range(num_hashes):
        x = (1_103_515_245 * x + 12_345) % (1 << 31)
        a = x % (MINHASH_P - 1) + 1
        x = (1_103_515_245 * x + 12_345) % (1 << 31)
        b = x % MINHASH_P
        params.append((a, b))
    return params


def _shingle_stream(df: DataFrame, text_col: str, id_col: str, k: int) -> DataFrame:
    """Exploded (id, shingle) stream: one row per k-word shingle
    position (NOT distinct — callers that need set semantics dedupe on
    top, see ``ngram_jaccard_pairs``). Shape: materialize the split
    words array ONCE per doc (a projection below the Generate, so
    Catalyst cannot re-inline the split into per-row expressions),
    explode the shingle POSITIONS 1..max(n-k+1, 1), then slice k words
    out of the materialized array per position — three codegen
    operators, zero exchanges, zero sorts.

    History: this replaced the posexplode+window-lead() form (which
    itself replaced an interpreted transform()/slice() lambda, 13.1s
    cold at sf0.1). The window form paid a hash(id) exchange + per-doc
    sort + row-at-a-time WindowExec just to rebuild adjacency that the
    words array already has: measured 4.28s vs 0.42s for this form at
    sf0.1 (identical output checksum). Map-side construction also
    means every downstream per-doc aggregate now partial-aggregates
    BEFORE its exchange (e.g. minhash's 32 mins shuffle one partial
    row per doc per input split, not the raw shingle stream), which is
    strictly less shuffle traffic at any scale. Parallelism comes from
    input splits (maxPartitionBytes), not a pre-exchange — at corpus
    scale the scan has thousands of splits; only a single tiny file
    funnels into one task, where this form is ~10x faster anyway.

    Docs shorter than k words emit exactly one shingle — the whole
    text (greatest(n-k+1, 1) pins position 1; slice past the end
    returns the remaining words)."""
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    n = F.size(F.col("_ws"))
    return (
        df.select(F.col(id_col), words.alias("_ws"))
        .select(
            F.col(id_col),
            F.col("_ws"),
            F.explode(
                F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1)))
            ).alias("_i"),
        )
        .select(
            F.col(id_col),
            F.concat_ws(" ", F.slice(F.col("_ws"), F.col("_i"), k)).alias("_s"),
        )
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 32,
    shingle_k: int = 3,
    hash_fn: str = "md5",
) -> DataFrame:
    """MinHash signature per doc.

    hash_fn='md5' (default, oracle-checkable): ONE md5-prefix base
    hash per shingle, then num_hashes affine transforms
    (a_i*h + b_i) mod P — the classic universal-hash MinHash; cheaper
    than hashing num_hashes times AND bit-reproducible in DuckDB.
    hash_fn='xxhash64': sig[i] = min xxhash64(shingle, i) (kept as the
    raw-throughput variant; not oracle-checkable).

    Shape: the codegen shingle stream (see ``_shingle_stream``) ->
    num_hashes flat MIN aggregates -> array. Duplicate shingles need
    no array_distinct: they cannot change a MIN. The stream is pure
    map-side, so the groupBy's partial aggregation folds the md5 +
    affine mins into one row per doc per input split BEFORE the only
    exchange — the shuffle carries num_hashes longs per doc, never
    the raw shingle stream.
    """
    ex = _shingle_stream(df, text_col, id_col, shingle_k)
    if hash_fn == "md5":
        ex = ex.withColumn("_h", F.pmod(md5_hash60(F.col("_s")), F.lit(MINHASH_P)))
        mins = [
            F.min(F.pmod(F.col("_h") * F.lit(a) + F.lit(b), F.lit(MINHASH_P))).alias(f"_h{i}")
            for i, (a, b) in enumerate(minhash_params(num_hashes))
        ]
    else:
        mins = [
            F.min(F.xxhash64(F.col("_s"), F.lit(i))).alias(f"_h{i}") for i in range(num_hashes)
        ]
    agg = ex.groupBy(id_col).agg(*mins)
    return agg.select(
        F.col(id_col), F.array(*[F.col(f"_h{i}") for i in range(num_hashes)]).alias("minhash")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    hash_fn: str = "md5",
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash LSH.

    Signature is cut into `bands` bands of num_hashes/bands rows; docs
    sharing any band hash become a candidate pair. The only shuffle is
    the groupBy on (band, band_hash) — hash-distributed; a band bucket
    holding B docs emits B-1 pairs against the bucket min, keeping
    output linear (union-find style anchor) instead of quadratic.

    With hash_fn='md5' the band key is the literal joined signature
    slice (oracle-reproducible); with 'xxhash64' it is hashed down to
    8 bytes to shrink shuffle rows.
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_k, hash_fn)
    # one pass: signature -> array of band hashes -> posexplode. The
    # signature (the expensive expression) is evaluated exactly once
    # per row; no self-join.
    if hash_fn == "md5":
        band_hashes = F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.concat_ws(",", F.slice(F.col("minhash"), b * rows_per_band + 1, rows_per_band)),
        )
    else:
        band_hashes = F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.xxhash64(
                F.concat_ws(",", F.slice(F.col("minhash"), b * rows_per_band + 1, rows_per_band)), b
            ),
        )
    banded = sigs.select(
        F.col(id_col), F.posexplode(band_hashes).alias("band", "band_hash")
    )
    # anchor = min(id) per band bucket via an unordered window, NOT a
    # groupBy + self-join: the join form makes Catalyst evaluate the
    # whole signature subtree (explode + md5 + num_hashes mins) once
    # per branch — measured 2x the query's cost — while the window
    # computes signatures once and pays one (band, band_hash) shuffle.
    w = Window.partitionBy("band", "band_hash")
    pairs = (
        banded.withColumn("anchor_id", F.min(F.col(id_col)).over(w))
        .filter(F.col(id_col) != F.col("anchor_id"))
        .select(F.col("anchor_id").alias("id_a"), F.col(id_col).alias("id_b"))
        .distinct()
    )
    return pairs


def simhash(
    df: DataFrame, text_col: str, id_col: str, bits: int = 64, hash_fn: str = "md5"
) -> DataFrame:
    """SimHash per doc from word-level features.

    For each bit b, the bit is 1 iff sum over distinct words of
    sign(bit b of hash(word)) is positive. Built from SQL
    aggregate/transform higher-order functions (shiftright with a
    non-literal shift is SQL-only) — no UDF, one map-side pass.

    hash_fn='md5' (default): 60-bit md5-prefix word hash, exactly
    reproducible in the DuckDB oracle (bits capped at 60).
    hash_fn='xxhash64': full 64-bit variant, not oracle-checkable.
    """
    if hash_fn == "md5":
        bits = min(bits, 60)
        word_hash = "cast(conv(substring(md5(w), 1, 15), 16, 10) as bigint)"
    else:
        word_hash = "xxhash64(w)"
    ws = df.select(
        F.col(id_col),
        F.expr(
            f"transform(array_distinct(split(lower(trim({text_col})), '\\\\s+')), w -> {word_hash})"
        ).alias("_hs"),
    )
    sig = F.expr(
        f"""
        aggregate(
          transform(sequence(0, {bits - 1}), b ->
            CASE WHEN aggregate(_hs, cast(0 AS bigint),
                   (acc, h) -> acc + CASE WHEN (shiftright(h, b) & 1) = 1 THEN 1 ELSE -1 END) > 0
                 THEN shiftleft(cast(1 AS bigint), b) ELSE cast(0 AS bigint) END),
          cast(0 AS bigint), (acc, x) -> acc | x)
        """
    )
    return ws.select(F.col(id_col), sig.alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_k: int = 3,
    threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """N-gram Jaccard similarity for candidate pairs.

    Explodes shingles, self-joins on shingle (the inverted-index
    pattern: shuffle keyed by shingle hash), counts shared shingles
    per pair, then Jaccard = |∩| / (|A|+|B|-|∩|). Pairs below
    `threshold` are dropped before the final projection.

    Shingles enter the inverted index as their xxhash64 — every
    downstream shuffle, aggregate, and the self-join key on 8-byte
    longs instead of full k-word strings (measured 25% faster at
    sf0.1; at 100 TB it shrinks the three _s-keyed exchanges by the
    mean shingle length). Jaccard is therefore exact modulo 64-bit
    collisions: a collision must fall WITHIN one doc (set-size drop)
    or one compared pair (intersection bump) to matter, P < n_doc² /
    2^64 per pair — and the DuckDB oracle hashes nothing, so any
    collision that changed a value would flip the gate red.

    ``max_df`` is the scale guard: a shingle shared by B documents
    emits B(B-1)/2 join rows, so ONE boilerplate shingle across 1M
    docs is ~10^12 rows. Shingles with document frequency > max_df are
    dropped from the inverted index before the self-join (the standard
    prefix-filter/stopword cap); set sizes in the denominator still
    count every shingle, so capped Jaccard is a conservative
    underestimate — deterministic and mirrored exactly in the oracle.
    """
    # Jaccard is over shingle SETS: dedupe per (id, shingle) — the
    # dropDuplicates partial-dedupes map-side, then exchanges the
    # surviving (8-byte, 8-byte) pairs once. The deduped stream is
    # PERSISTED (memory-and-disk, lineage kept): four consumers hang
    # off it (set sizes, df-cap, both self-join sides), and without a
    # materialization each re-derives from the scan — at corpus scale
    # that is four extra column-pruned passes over the text. Unlike
    # the string shingle stream (whose columnar cache measured 3x
    # slower at sf0.1/32 threads — G1 humongous-allocation churn, cf.
    # session.py notes), this is the post-dedup long-pair stream: 16
    # bytes per distinct (doc, shingle), smaller than any re-derived
    # exchange of it, and eviction under pressure just falls back to
    # lineage recompute.
    ex = (
        _shingle_stream(df, text_col, id_col, shingle_k)
        .select(F.col(id_col).alias("_id"), F.xxhash64("_s").alias("_s"))
        .dropDuplicates(["_id", "_s"])
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # distinct-shingle set size per doc (map-side partial count, then
    # one exchange of per-doc partials)
    sizes = ex.groupBy("_id").agg(F.count("*").alias("_n"))
    if max_df is not None:
        rare = (
            ex.groupBy("_s")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_df)
            .select("_s")
        )
        # equi-join on the shingle: df counts combine map-side, and the
        # hot shingles (the skew) are exactly the ones removed
        ex = ex.join(rare, "_s")
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(b, (F.col("a._s") == F.col("b._s")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count("*").alias("_inter"))
    )
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("_n").alias("_na"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("_n").alias("_nb"))
    out = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("_inter") / (F.col("_na") + F.col("_nb") - F.col("_inter"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out


def embedding_neardup_pairs(
    df: DataFrame, vec_col: str, id_col: str, threshold: float = 0.95, n_buckets: int = 8
) -> DataFrame:
    """Embedding-cosine near-dup pairs.

    Scale path: random-hyperplane LSH — sign-bucket each vector by a
    few xxhash64-seeded hyperplanes (deterministic), only compare
    within a bucket, so the candidate join is bucket-local instead of
    a full cross join. Cosine via zip_with/aggregate (JVM-side).
    """
    v = F.col(vec_col)
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    unit = F.transform(v, lambda x: x / norm)
    dim = F.size(v)
    # deterministic pseudo-hyperplanes: plane p component i = hash -> [-1,1)
    planes = F.sequence(F.lit(0), F.lit(n_buckets - 1))
    sign_bits = F.transform(
        planes,
        lambda p: F.when(
            F.aggregate(
                F.zip_with(
                    unit,
                    F.sequence(F.lit(0), dim - 1),
                    lambda x, i: x * ((F.pmod(F.xxhash64(i, p), F.lit(2000)).cast("double") - 1000.0) / 1000.0),
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            > 0,
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    bucket = F.aggregate(
        F.zip_with(
            sign_bits,
            F.sequence(F.lit(0), F.lit(n_buckets - 1)),
            lambda bit, i: (bit * F.pow(F.lit(2.0), i)).cast("int"),
        ),
        F.lit(0),
        lambda a, x: a + x,
    )
    side = df.select(F.col(id_col).alias("_id"), unit.alias("_u"), bucket.alias("_b"))
    a, b = side.alias("a"), side.alias("b")
    cos = F.aggregate(
        F.zip_with(F.col("a._u"), F.col("b._u"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.join(b, (F.col("a._b") == F.col("b._b")) & (F.col("a._id") < F.col("b._id")))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
