"""Deterministic synthetic token-sequence table (FIXTURES.md §1).

Input shape from BASELINE.json input_hint:
    doc_id:string, tokens:array<int32>, n_tok:int32, source:string

Generated DISTRIBUTED: `spark.range(n)` partitions the id space across
executors and every column derives from the id via splittable counter-based
hashing (no driver-side materialization, no Python RNG in the loop) — the
same construction works unchanged at 10^12 rows on a real cluster because
each executor generates its own partition independently.

Token values use a xorshift-style mix of (doc index, position) so the
expected array for any doc_id is recomputable exactly → the per-row
token-array-equality invariant (write → read → validate, element-wise
identical; the reference's order-sensitive array equality,
Utilities.pm:289-296) is checkable without storing a golden copy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

VOCAB_SIZE = 50257
MAX_LEN = 2048

# (source, license, weight) — skewed on purpose: `web` is the hot key that
# exercises skew-salting in the referential join and drift groupBy.
SOURCE_DICT_ROWS = [
    ("web", "cc-by", 0.55),
    ("books", "proprietary", 0.15),
    ("code", "mit", 0.15),
    ("wiki", "cc-by-sa", 0.10),
    ("forums", "cc-by", 0.05),
]
_CUM = [0.55, 0.70, 0.85, 0.95, 1.0]


def _mix(i, j):
    """Deterministic 64-bit mix of two integer columns (JVM-side xxhash64)."""
    return F.xxhash64(i, j)


TOKEN_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("tokens", T.ArrayType(T.IntegerType(), containsNull=False)),
    T.StructField("n_tok", T.IntegerType()),
    T.StructField("source", T.StringType()),
])
"""Contract read schema for the token table (BASELINE.json input_hint:
tokens:array<int32> with non-null elements by construction).  Declaring
containsNull=False lets the compiler drop the per-element null conjunct
from the items fast path — the whole row pass then stays inside
whole-stage codegen.  Use read_token_table(); validating data of unknown
provenance should read without this schema (the engine then runs the
exact, slower null-aware path)."""


def read_token_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(TOKEN_SCHEMA).parquet(path)


def sequences_df(
    spark: SparkSession,
    n_rows: int,
    seed: int = 42,
    partitions: int | None = None,
    corrupt: bool = False,
) -> DataFrame:
    """Build the token table. With corrupt=True, a deterministic ~0.6% of
    rows get injected violations (FIXTURES.md §3) with predictable doc_ids."""
    rng = spark.range(0, n_rows, numPartitions=partitions)
    i = F.col("id")
    h = _mix(i, F.lit(seed))

    # n_tok: clipped geometric-ish length in [1, MAX_LEN] via mixing
    u = (F.pmod(h, F.lit(1_000_000)) + 500_000) / F.lit(1_000_000.0)  # (0.5, 1.5)
    n_tok = F.least(
        F.greatest((F.pow(F.lit(2.0), u * 11) % MAX_LEN).cast("int") + 1, F.lit(1)),
        F.lit(MAX_LEN),
    )

    # source: categorical by cumulative weights over a uniform hash draw
    su = F.pmod(F.abs(_mix(i, F.lit(seed + 1))), F.lit(10_000)) / 10_000.0
    source = F.lit(SOURCE_DICT_ROWS[-1][0])
    for name, cum in zip([r[0] for r in SOURCE_DICT_ROWS][::-1], _CUM[::-1]):
        source = F.when(su < cum, name).otherwise(source)

    # tokens[j] = mix(id, j) mod VOCAB — element-wise recomputable
    tokens = F.transform(
        F.sequence(F.lit(0), n_tok - 1),
        lambda j: F.pmod(F.abs(_mix(i + F.lit(seed), j)), F.lit(VOCAB_SIZE)).cast("int"),
    )

    df = rng.select(
        F.format_string("doc-%012d", i).alias("doc_id"),
        tokens.alias("tokens"),
        n_tok.cast("int").alias("n_tok"),
        source.alias("source"),
    )
    if corrupt:
        df = _corrupt(df, seed)
    return df


def expected_tokens_expr(doc_index, n_tok, seed: int = 42):
    """Recompute the expected token array for a doc index (the golden copy
    for the per-row token-array-equality invariant)."""
    return F.transform(
        F.sequence(F.lit(0), n_tok - 1),
        lambda j: F.pmod(F.abs(_mix(doc_index + F.lit(seed), j)), F.lit(VOCAB_SIZE)).cast("int"),
    )


def _corrupt(df: DataFrame, seed: int) -> DataFrame:
    """Deterministic violation injection keyed on doc index (FIXTURES.md §3).
    Buckets by `idx % 1000`: 1→bad_token, 2→neg_token, 3→bad_ntok,
    4→null_source, 5→unknown_source, 6→dup (via union below)."""
    idx = F.regexp_extract("doc_id", r"(\d+)", 1).cast("long")
    b = F.pmod(idx, F.lit(1000))
    tokens = (
        F.when(b == 1, F.concat(F.slice("tokens", 1, F.greatest(F.size("tokens") - 1, F.lit(0))),
                                F.array(F.lit(99_999))))
        .when(b == 2, F.concat(F.array(F.lit(-1)),
                               F.slice("tokens", 2, F.greatest(F.size("tokens") - 1, F.lit(0)))))
        .otherwise(F.col("tokens"))
    )
    n_tok = F.when(b == 3, F.col("n_tok") + 1).otherwise(F.col("n_tok")).cast("int")
    source = (
        F.when(b == 4, F.lit(None).cast("string"))
        .when(b == 5, F.lit("smuggled"))
        .otherwise(F.col("source"))
    )
    out = df.select("doc_id", tokens.cast("array<int>").alias("tokens"), n_tok.alias("n_tok"), source.alias("source"))
    dups = out.filter(b == 6)
    return out.unionAll(dups)


def source_dict_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(SOURCE_DICT_ROWS, "source string, license string, weight double")
