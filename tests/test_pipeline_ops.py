"""Shard-shuffle export, DSIR importance weights, and SemDeDup pruning.

Each operator gets a hand-computed expectation on a tiny frame plus a
DuckDB replay of the oracle SQL over sf0.001 parquet (the driver gate's
comparison at sf0.01, shrunk)."""

from __future__ import annotations

import math

import duckdb

from pyspark.sql import functions as F


# ------------------------------------------------------------- shards

def test_assign_shards_deterministic_and_dense(spark):
    from json_schema_modern_spark.operators.shards import assign_shards

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id")
    a = {r.doc_id: (r.shard, r.pos) for r in
         assign_shards(docs, n_shards=4).collect()}
    b = {r.doc_id: (r.shard, r.pos) for r in
         assign_shards(docs, n_shards=4).collect()}
    assert a == b                       # stable across runs, no RNG
    # positions dense 1..n per shard
    per = {}
    for shard, pos in a.values():
        per.setdefault(shard, []).append(pos)
    assert set(per) <= {0, 1, 2, 3}
    for shard, poss in per.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard


def test_assign_shards_order_is_md5_not_input(spark):
    """Reversing the input row order must not change any (shard, pos)."""
    from json_schema_modern_spark.operators.shards import assign_shards

    docs = spark.createDataFrame(
        [(i,) for i in range(50)], "doc_id long")
    rev = spark.createDataFrame(
        [(i,) for i in reversed(range(50))], "doc_id long")
    a = {r.doc_id: (r.shard, r.pos)
         for r in assign_shards(docs, n_shards=3).collect()}
    b = {r.doc_id: (r.shard, r.pos)
         for r in assign_shards(rev, n_shards=3).collect()}
    assert a == b


def test_shards_oracle_parity(spark):
    from json_schema_modern_spark.operators.shards import (
        assign_shards, shards_oracle_sql,
    )

    path = "/root/testdata/sf0.001/documents.parquet"
    got = sorted(
        tuple(r) for r in
        assign_shards(spark.read.parquet(path).select("doc_id"),
                      n_shards=8).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')")
    want = sorted(con.execute(shards_oracle_sql("documents")).fetchall())
    assert got == want


def test_shard_summary_manifest(spark):
    from json_schema_modern_spark.operators.shards import shard_summary

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").select("doc_id")
    n = docs.count()
    rows = shard_summary(docs, n_shards=4).collect()
    assert sum(r.n_rows for r in rows) == n
    for r in rows:
        assert r.max_pos == r.n_rows    # dense => manifest is seekable


# --------------------------------------------------------------- DSIR

def test_dsir_hand_case(spark):
    """2-bucket-free hand check: target doc repeats 'aa', raw adds 'bb';
    the target-token bucket must score above the raw-only bucket."""
    from json_schema_modern_spark.operators.importance import dsir_weights

    df = spark.createDataFrame(
        [(1, "aa aa aa", "en"), (2, "bb bb bb", "de")],
        "doc_id long, text string, lang string")
    out = {r.doc_id: r for r in dsir_weights(df, buckets=16).collect()}
    assert out[1].n_terms == 3 and out[2].n_terms == 3
    # doc 1 is pure target vocabulary -> strictly higher weight
    assert out[1].log_weight > out[2].log_weight
    assert out[1].avg_log_ratio > out[2].avg_log_ratio
    # closed-form: T_tgt=3, T_raw=6, B=16; bucket(aa): n_tgt=3, n_raw=3
    lr_aa = math.log(4 / 19) - math.log(4 / 22)
    assert abs(out[1].log_weight - round(3 * lr_aa, 6)) < 1e-9


def test_dsir_zero_token_docs_kept(spark):
    from json_schema_modern_spark.operators.importance import dsir_weights

    df = spark.createDataFrame(
        [(1, "hello world", "en"), (2, "12345 !!!", "de"), (3, None, "en")],
        "doc_id long, text string, lang string")
    out = {r.doc_id: r for r in dsir_weights(df).collect()}
    assert set(out) == {1, 2, 3}
    for d in (2, 3):                    # no [a-z] tokens -> neutral row
        assert out[d].n_terms == 0
        assert out[d].log_weight == 0.0
        assert out[d].avg_log_ratio == 0.0


def test_dsir_oracle_parity(spark):
    from json_schema_modern_spark.operators.importance import (
        dsir_oracle_sql, dsir_weights,
    )

    path = "/root/testdata/sf0.001/documents.parquet"
    got = sorted(
        (r.doc_id, r.n_terms, r.log_weight, r.avg_log_ratio)
        for r in dsir_weights(spark.read.parquet(path)).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')")
    want = sorted(con.execute(dsir_oracle_sql("documents")).fetchall())
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:2] == w[:2]
        assert abs(g[2] - w[2]) < 1e-9, (g, w)
        assert abs(g[3] - w[3]) < 1e-9, (g, w)


# ----------------------------------------------------------- SemDeDup

def test_semdedup_hand_case(spark):
    """Identical vectors share a bucket; the non-representative one is
    pruned; an orthogonal vector in another bucket survives."""
    from json_schema_modern_spark.operators.similarity import semantic_dedup

    dim = 64
    v = [1.0] + [0.0] * (dim - 1)
    w = [-x for x in v]
    rows = [(1, v), (2, v), (3, w)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r for r in
           semantic_dedup(df, dim=dim, threshold=0.9).collect()}
    assert out[1].keep and out[1].rep_id == 1 and out[1].sim == 1.0
    assert not out[2].keep and out[2].rep_id == 1 and out[2].sim == 1.0
    # v and -v land in complementary sign buckets -> 3 is its own rep
    assert out[3].keep and out[3].rep_id == 3
    assert out[1].bucket != out[3].bucket


def test_semdedup_keep_join_is_dedup(spark):
    """keep=True rows contain exactly one member of every pruned pair's
    bucket-representative relation (the paper's dedup contract)."""
    from json_schema_modern_spark.operators.similarity import semantic_dedup

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = semantic_dedup(emb, threshold=0.3).cache()
    # every bucket's representative is kept
    assert out.where((F.col("vec_id") == F.col("rep_id"))
                     & ~F.col("keep")).count() == 0
    # pruned rows really clear the threshold against their rep
    assert out.where(~F.col("keep") & (F.col("sim") < 0.3)).count() == 0
    assert out.count() == emb.count()   # one verdict per row
    out.unpersist()


def test_semdedup_scale_shape(spark):
    """Plan shape: no cartesian/self-join — the scoring join must be a
    broadcast equi-join on the bucket key."""
    from json_schema_modern_spark.operators.similarity import semantic_dedup

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = semantic_dedup(emb)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_shards_parity_edge_ids(spark):
    """Negative / huge / boundary ids hash identically in both engines
    (the md5 input is the decimal string rendering on both sides)."""
    from json_schema_modern_spark.operators.shards import (
        assign_shards, shards_oracle_sql,
    )

    ids = [-1, 0, 1, -(2**62), 2**62, 999999999999, -42]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = sorted(tuple(r) for r in assign_shards(df, n_shards=5).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(i,) for i in ids])
    want = sorted(con.execute(
        shards_oracle_sql("t", n_shards=5)).fetchall())
    assert got == want


def test_dsir_parity_unicode_and_empty(spark):
    """Unicode text (case-mapped chars, CJK, combining marks), empty and
    null strings replay identically through the DuckDB oracle."""
    from json_schema_modern_spark.operators.importance import (
        dsir_oracle_sql, dsir_weights,
    )

    rows = [
        (1, "Hello WORLD Straße İstanbul", "en"),
        (2, "你好 世界 mixedLatin123tail", "zh"),
        (3, "", "en"),
        (4, None, "de"),
        (5, "ﬀ ligature K kelvin", "en"),   # U+FB00, U+212A
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = sorted(
        (r.doc_id, r.n_terms, r.log_weight, r.avg_log_ratio)
        for r in dsir_weights(df).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR, lang VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", rows)
    want = sorted(con.execute(dsir_oracle_sql("documents")).fetchall())
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:2] == w[:2], (g, w)
        assert abs(g[2] - w[2]) < 1e-9 and abs(g[3] - w[3]) < 1e-9, (g, w)


# --------------------------------------------------------- diversity

def test_distinct_ngram_hand_case(spark):
    from json_schema_modern_spark.operators.diversity import (
        distinct_ngram_ratio,
    )

    df = spark.createDataFrame(
        [("a", "x y x y x"),      # bigrams: xy yx xy yx -> 4 total 2 distinct
         ("a", "x y"),            # bigram xy -> dup of the corpus gram
         ("b", "p q r")],         # pq qr -> all distinct
        "source string, text string")
    out = {r.source: r for r in distinct_ngram_ratio(df, n=2).collect()}
    assert (out["a"].total_ngrams, out["a"].distinct_ngrams) == (5, 2)
    assert out["a"].distinct_ratio == 0.4
    assert (out["b"].total_ngrams, out["b"].distinct_ngrams) == (2, 2)
    assert out["b"].distinct_ratio == 1.0


def test_zipf_slope_on_exact_power_law(spark):
    """Frequencies freq(r) = round(1000 / r) follow Zipf with slope -1;
    the OLS fit over ln-ln must recover ~-1."""
    from json_schema_modern_spark.operators.diversity import zipf_slope

    rows = []
    for r in range(1, 21):
        tok = f"w{r:02d}"
        rows.extend(("s", tok) for _ in range(round(1000 / r)))
    df = spark.createDataFrame(
        [("s", " ".join(t for _, t in rows)) ],
        "source string, text string")
    out = zipf_slope(df).collect()[0]
    assert out.n_types == 20
    assert -1.05 < out.slope < -0.95, out.slope


def test_zipf_degenerate_head_is_null(spark):
    """A source whose head has one distinct rank (var = 0) yields NULL
    slope — guarded identically in Spark and the oracle, since raw 0/0
    is NULL or NaN depending on the DuckDB version."""
    from json_schema_modern_spark.operators.diversity import zipf_slope

    df = spark.createDataFrame(
        [("solo", "same same same")], "source string, text string")
    out = zipf_slope(df).collect()[0]
    assert out.n_types == 1 and out.head_tokens == 3
    assert out.slope is None


def test_diversity_oracle_parity(spark):
    from json_schema_modern_spark.operators.diversity import (
        distinct_ngram_oracle_sql, distinct_ngram_ratio,
        zipf_slope, zipf_slope_oracle_sql,
    )

    path = "/root/testdata/sf0.001/documents.parquet"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')")
    docs = spark.read.parquet(path)

    got = sorted(tuple(r) for r in distinct_ngram_ratio(docs, n=3).collect())
    want = sorted(con.execute(
        distinct_ngram_oracle_sql("documents", n=3)).fetchall())
    assert got == want

    got = sorted(tuple(r) for r in zipf_slope(docs, top_k=50).collect())
    want = sorted(con.execute(
        zipf_slope_oracle_sql("documents", top_k=50)).fetchall())
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:3] == w[:3]
        assert abs(g[3] - w[3]) < 1e-9, (g, w)


# ------------------------------------------------- winnowing regression

def test_winnowing_wide_window_no_cross_doc_spill(spark):
    """w > doc_len + k: a short document's single window must read only
    its own (masked-padded) positions, never the neighbor's gram hashes.
    Regression: the vectorized batch used a fixed k-wide separator, so
    'zzzz' with k=4, w=16 stole a fingerprint from the next document."""
    from json_schema_modern_spark.operators.text import (
        winnowing_fingerprints,
    )

    df = spark.createDataFrame(
        [(1, "zzzz"), (2, "short doc")], "doc_id long, text string")
    got = {r.doc_id: sorted(r.prints)
           for r in winnowing_fingerprints(df, k=4, w=16).collect()}

    def ref(text, k, w):
        import re
        s = re.sub(r"\s+", " ", re.sub(r"[^a-z0-9]+", " ", text.lower())).strip()
        if len(s) < k:
            return []
        hs = [sum(ord(c) << (7 * (k - 1 - j)) for j, c in enumerate(s[i:i + k]))
              for i in range(len(s) - k + 1)]
        if len(hs) < w:
            return sorted(set([min(hs)]))
        return sorted({min(hs[i:i + w]) for i in range(len(hs) - w + 1)})

    assert got[1] == ref("zzzz", 4, 16)
    assert got[2] == ref("short doc", 4, 16)
    # default params unchanged (oracle-hash compatibility)
    got8 = {r.doc_id: sorted(r.prints)
            for r in winnowing_fingerprints(df).collect()}
    assert got8[2] == ref("short doc", 8, 4)
