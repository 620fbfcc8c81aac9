"""Deterministic, fully-distributed synthetic data generation.

Generates the CDC fixtures from FIXTURES.md §F1/§F2 (the
``(repo,path,commit,lang,content)`` source table and the
``change_events`` stream) using only JVM-side expressions over
``spark.range`` — no Python RNG, no driver loops — so the exact same
generator is used by pytest at 10^4 events and by the throughput
bench at 10^8+, and every run is bit-identical for a given seed.

Randomness = ``xxhash64(id, tag, seed)`` mapped to [0,1); skew =
inverse-CDF power transform (u^3) so a few (repo,path) keys are hot,
mirroring the hot-repo skew the north rule requires us to break with
salting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EXTS = ["py", "rs", "ts", "md", "toml"]
EXT_LANG = {"py": "Python", "rs": "Rust", "ts": "TypeScript", "md": "Markdown", "toml": "TOML"}
GENESIS_LSN = 0


def _u(tag: str, seed: int, *cols) -> F.Column:
    """Deterministic uniform [0,1) from a hash of (cols, tag, seed)."""
    h = F.xxhash64(*cols, F.lit(tag), F.lit(seed))
    return (F.pmod(h, F.lit(1_000_000)).cast("double")) / 1_000_000.0


def _key_cols(key_id: F.Column, paths_per_repo: int):
    """Map a dense key id -> (repo, path, ext). Deterministic, invertible."""
    repo_id = (key_id / paths_per_repo).cast("long")
    path_id = F.pmod(key_id, F.lit(paths_per_repo))
    repo = F.concat(
        F.lit("org"), F.pmod(repo_id, F.lit(17)).cast("string"), F.lit("/repo"), repo_id.cast("string")
    )
    ext = F.element_at(F.array(*[F.lit(e) for e in EXTS]), (F.pmod(path_id, F.lit(len(EXTS))) + 1).cast("int"))
    path = F.concat(
        F.lit("src/m"),
        F.pmod(path_id, F.lit(13)).cast("string"),
        F.lit("/file"),
        path_id.cast("string"),
        F.lit("."),
        ext,
    )
    return repo, path, ext


def _lang_from_ext(ext: F.Column) -> F.Column:
    m = F.create_map(*[F.lit(x) for kv in EXT_LANG.items() for x in kv])
    return m[ext]


def _content(
    repo: F.Column, path: F.Column, commit: F.Column, seed: int, max_len: int = 4096
) -> F.Column:
    """Deterministic pseudo-code text, 64..max_len chars, derived from
    the key. max_len=4096 is the canonical shape; smaller values give a
    CPU-bound variant for isolating engine scaling from the sandbox
    host's ~2.9 GB/s memory-bandwidth wall (BENCH/BASELINE.md)."""
    base = F.md5(F.concat(repo, F.lit("\x00"), path, F.lit("\x00"), commit))
    span = max(max_len - 63, 1)
    length = (F.pmod(F.xxhash64(base, F.lit("len"), F.lit(seed)), F.lit(span)) + 64).cast("int")
    # unit is 81 chars; 52 repeats covers 4096 (kept so the default
    # output stays byte-identical to the original fixture)
    reps = 52 if max_len >= 4096 else (max_len // 81 + 1)
    body = F.repeat(F.concat(F.lit("fn "), base, F.lit("() { /* "), F.reverse(base), F.lit(" */ }\n")), reps)
    return F.substring(body, 1, max_len).substr(F.lit(1), length)


def source_snapshot(
    spark: SparkSession,
    n_keys: int,
    seed: int = 42,
    paths_per_repo: int = 50,
    content_max: int = 4096,
) -> DataFrame:
    """Initial state of the source-code repo table (FIXTURES.md §F1)."""
    df = spark.range(n_keys).withColumnRenamed("id", "key_id")
    repo, path, ext = _key_cols(F.col("key_id"), paths_per_repo)
    commit = F.md5(F.concat(repo, path, F.lit("genesis")))
    lang = F.when(_u("langnull", seed, F.col("key_id")) < 0.15, F.lit(None)).otherwise(
        _lang_from_ext(ext)
    )
    return df.select(
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        _content(repo, path, commit, seed, content_max).alias("content"),
        F.lit(GENESIS_LSN).cast("long").alias("lsn"),
    )


def change_event_cols(
    df: DataFrame,
    n_keys: int,
    seed: int = 42,
    paths_per_repo: int = 50,
    skew: float = 3.0,
    content_max: int = 4096,
) -> DataFrame:
    """Map any DataFrame bearing an ``lsn`` column (batch range, rate
    source, socket ticks) to full deterministic change-event columns —
    the single definition shared by the batch generator and the
    streaming rate source (streaming/cdc.py:rate_source_events)."""
    u_key = _u("key", seed, F.col("lsn"))
    key_id = F.least(
        (F.pow(u_key, F.lit(skew)) * n_keys).cast("long"), F.lit(n_keys - 1)
    )
    repo, path, ext = _key_cols(key_id, paths_per_repo)
    u_op = _u("op", seed, F.col("lsn"))
    op = F.when(u_op < 0.08, "D").when(u_op < 0.40, "I").otherwise("U")
    commit = F.md5(F.concat(repo, path, F.col("lsn").cast("string")))
    lang = F.when(_u("elangnull", seed, F.col("lsn")) < 0.2, F.lit(None)).otherwise(
        _lang_from_ext(ext)
    )
    return df.select(
        F.col("lsn"),
        op.alias("op"),
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        F.when(op == "D", F.lit(None)).otherwise(lang).alias("lang"),
        F.when(op == "D", F.lit(None)).otherwise(
            _content(repo, path, commit, seed, content_max)
        ).alias("content"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("lsn")).alias("event_ts"),
    )


def change_events(
    spark: SparkSession,
    n_events: int,
    n_keys: int,
    seed: int = 42,
    paths_per_repo: int = 50,
    first_lsn: int = 1,
    skew: float = 3.0,
    dup_every: int = 97,
    with_lang_confidence: bool = False,
    content_max: int = 4096,
) -> DataFrame:
    """A slice of the CDC change stream (FIXTURES.md §F2).

    - LSNs are ``first_lsn .. first_lsn+n_events-1`` (globally ordered).
    - Hot-key skew: key = floor(n_keys * u^skew).
    - Exact-duplicate rows are injected for lsn % dup_every == 0
      (replay/dup tests -- the engine must be idempotent under them).
    - ``with_lang_confidence`` emits the schema-evolution variant
      (extra double column) the target must absorb additively.
    """
    df = spark.range(n_events).select((F.col("id") + first_lsn).alias("lsn"))
    ev = change_event_cols(
        df, n_keys, seed=seed, paths_per_repo=paths_per_repo, skew=skew, content_max=content_max
    )
    if with_lang_confidence:
        ev = ev.withColumn(
            "lang_confidence",
            F.when(F.col("op") == "D", F.lit(None)).otherwise(
                F.round(_u("conf", seed, F.col("lsn")), 4)
            ),
        )
    if dup_every:
        dups = ev.filter(F.pmod(F.col("lsn"), F.lit(dup_every)) == 0)
        ev = ev.unionByName(dups)
    return ev
