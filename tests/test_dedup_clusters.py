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
