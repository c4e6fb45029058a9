"""Connected-component duplicate-cluster resolution (pairs → clusters →
survivors) — join-based label propagation with pointer jumping."""

from json_schema_modern_spark.operators.dedup import resolve_duplicate_clusters


def test_chain_and_islands(spark):
    # a 21-node chain (worst case for plain propagation — pointer jumping
    # must close it inside the iteration budget), one 2-node island, and a
    # triangle sharing no nodes with either
    pairs = ([(i, i + 1) for i in range(20)]
             + [(100, 101)]
             + [(200, 201), (201, 202), (200, 202)])
    df = spark.createDataFrame(pairs, "id_a bigint, id_b bigint")
    rows = {r.doc_id: (r.cluster_id, r.is_survivor)
            for r in resolve_duplicate_clusters(df).collect()}
    assert all(rows[i] == (0, i == 0) for i in range(21))
    assert rows[100] == (100, True) and rows[101] == (100, False)
    assert {rows[n][0] for n in (200, 201, 202)} == {200}
    assert sum(1 for n in (200, 201, 202) if rows[n][1]) == 1


def test_survivor_is_min_id_per_cluster(spark):
    df = spark.createDataFrame([(7, 3), (3, 9), (12, 9)], "id_a bigint, id_b bigint")
    rows = {r.doc_id: (r.cluster_id, r.is_survivor)
            for r in resolve_duplicate_clusters(df).collect()}
    assert set(rows) == {3, 7, 9, 12}
    assert all(c == 3 for c, _ in rows.values())
    assert [n for n, (_, s) in rows.items() if s] == [3]


def test_keep_best_picks_highest_score_then_lowest_id(spark):
    from json_schema_modern_spark.operators.dedup import keep_best_in_clusters

    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)],
                                  "id_a bigint, id_b bigint")
    clusters = resolve_duplicate_clusters(pairs)
    scored = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.9), (10, 0.1), (11, 0.1)],
        "doc_id bigint, quality_score double")
    rows = {r.cluster_id: r for r in
            keep_best_in_clusters(clusters, scored).collect()}
    # cluster 1: 2 and 3 tie at 0.9 -> lowest id (2) wins, not min-id (1)
    assert rows[1].keep_id == 2 and rows[1].keep_score == 0.9
    assert rows[1].n_docs == 3
    # cluster 10: tie at 0.1 -> lowest id
    assert rows[10].keep_id == 10 and rows[10].n_docs == 2


def test_cross_source_pair_matrix(spark):
    from json_schema_modern_spark.operators.dedup import cross_source_pair_matrix

    pairs = spark.createDataFrame(
        [("a1", "b1"), ("a2", "b2"), ("a1", "a2"), ("b1", "b2")],
        "id_a string, id_b string")
    # docs table carries a REPEATED id (ingest-union shape) AND a
    # CONFLICTING re-ingested mapping (a2 under two sources) — the
    # min(source)-per-id map must keep the joins from multiplying pairs
    # in both cases (a distinct would keep both of a2's mappings and
    # double-count every pair touching a2)
    docs = spark.createDataFrame(
        [("a1", "A"), ("a2", "A"), ("b1", "B"), ("b2", "B"), ("a1", "A"),
         ("a2", "Z")],
        "doc_id string, source string")
    got = {(r.source_a, r.source_b): r.n_pairs
           for r in cross_source_pair_matrix(pairs, docs).collect()}
    assert got == {("A", "B"): 2, ("A", "A"): 1, ("B", "B"): 1}
