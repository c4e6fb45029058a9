"""Round-5 additions: chi-square drift, Spearman rank-correlation source
matrix, and per-document duplicate-span coverage."""

import math

from pyspark.sql import functions as F

from json_schema_modern_spark.operators.dedup import duplicate_span_coverage
from json_schema_modern_spark.operators.drift import chi2_drift, rank_corr_matrix


def test_chi2_matches_hand_computation(spark):
    # g1 dominates the pool (uniform, 80 rows) so the pool tracks it;
    # g2 (20 rows, bucket-1-heavy) is the drifted minority
    rows = [("g1", v) for v in [0, 1, 2, 3] * 20] + \
           [("g2", v) for v in [0] * 16 + [1, 2, 3, 3]]
    df = spark.createDataFrame(rows, "source string, x int")
    got = {r.source: r for r in
           chi2_drift(df, "x", "source", 0.0, 4.0, 4, threshold=3.0).collect()}

    # hand replay: buckets 1..4 (width_bucket), global counts per bucket
    g1 = {1: 20, 2: 20, 3: 20, 4: 20}
    g2 = {1: 16, 2: 1, 3: 1, 4: 2}
    glob = {b: g1[b] + g2[b] for b in g1}
    n_glob, nb = sum(glob.values()), len(glob)
    for name, cnts in (("g1", g1), ("g2", g2)):
        n_grp = sum(cnts.values())
        chi2 = 0.0
        for b in sorted(glob):
            q = (glob[b] + 0.5) / (n_glob + 0.5 * nb)
            e = n_grp * q
            chi2 += (cnts[b] - e) ** 2 / e
        want = round(round(chi2 / (nb - 1), 9), 6)
        assert math.isclose(got[name].chi2_per_df, want, abs_tol=1e-9)
        assert got[name].drifted == (chi2 / (nb - 1) > 3.0)
    assert got["g2"].drifted and not got["g1"].drifted


def test_rank_corr_identical_and_reversed(spark):
    # s1/s2 order tokens identically; s3 reverses the frequency ranking
    def doc(tok_counts):
        out = []
        for tok, cnt in tok_counts:
            out.extend([tok] * cnt)
        return out

    df = spark.createDataFrame(
        [("s1", doc([(10, 9), (11, 6), (12, 3), (13, 1)])),
         ("s2", doc([(10, 90), (11, 60), (12, 30), (13, 10)])),
         ("s3", doc([(10, 1), (11, 3), (12, 6), (13, 9)]))],
        "source string, tokens array<int>")
    got = {(r.source_a, r.source_b): r for r in
           rank_corr_matrix(df, "tokens", "source").collect()}
    assert got[("s1", "s2")].rho == 1.0
    assert got[("s1", "s3")].rho == -1.0
    assert got[("s1", "s2")].n_common == 4


def test_rank_corr_degenerate_is_null(spark):
    # single shared token -> n_common = 1 -> zero rank variance -> NULL
    df = spark.createDataFrame(
        [("a", [5, 5, 5]), ("b", [5, 5])],
        "source string, tokens array<int>")
    row = rank_corr_matrix(df, "tokens", "source").head()
    assert row.n_common == 1 and row.rho is None


def test_span_coverage_dup_unique_short(spark):
    dup = list(range(10))
    df = spark.createDataFrame(
        [(1, dup), (2, dup),                      # exact duplicates
         (3, [100 + i for i in range(10)]),       # unique content
         (4, [1, 2, 3])],                         # < n tokens: no shingles
        "doc_id long, tokens array<int>")
    got = {r.doc_id: r for r in
           duplicate_span_coverage(df, ngram_n=5).collect()}
    assert got[1].shared_frac == 1.0 and got[1].n_shingles == 6
    assert got[2].shared_frac == 1.0
    assert got[3].shared_frac == 0.0 and got[3].n_shared == 0
    assert got[4].n_shingles == 0 and got[4].shared_frac is None


def test_span_coverage_partial_overlap(spark):
    # doc 2 shares doc 1's first 6 tokens -> grams at positions 1,2 of
    # each (5-grams over 6 shared tokens) are shared; rest unique
    df = spark.createDataFrame(
        [(1, list(range(10))),
         (2, list(range(6)) + [50, 51, 52, 53])],
        "doc_id long, tokens array<int>")
    got = {r.doc_id: r for r in
           duplicate_span_coverage(df, ngram_n=5).collect()}
    assert got[1].n_shingles == 6 and got[1].n_shared == 2
    assert got[2].n_shingles == 6 and got[2].n_shared == 2
    assert got[1].shared_frac == round(2 / 6, 6)


def test_embedding_contamination_flags_exact_match(spark):
    bench = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0]), (101, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<float>")
    train = spark.createDataFrame(
        [(1, [2.0, 0.0, 0.0]),    # parallel to bench 100 -> cos 1.0
         (2, [0.0, 0.0, 5.0]),    # orthogonal to both -> cos 0.0
         (3, [1.0, 1.0, 0.0])],   # 45 deg to both -> cos ~0.7071
        "vec_id long, embedding array<float>")
    from json_schema_modern_spark.operators.contamination import (
        embedding_contamination,
    )
    got = {r.vec_id: r for r in
           embedding_contamination(train, bench, threshold=0.8).collect()}
    assert got[1].max_sim == 1.0 and got[1].contaminated
    assert got[2].max_sim == 0.0 and not got[2].contaminated
    assert abs(got[3].max_sim - 0.707107) < 1e-6 and not got[3].contaminated


def test_temperature_weights_alpha_half_and_one(spark):
    from json_schema_modern_spark.operators.mixing import temperature_weights

    df = spark.createDataFrame(
        [("big", 90), ("small", 10)], "source string, n_tok int")
    # alpha=0.5 on a 90/10 split: sqrt(0.9)/(sqrt(0.9)+sqrt(0.1)) = 3/4
    got = {r.source: r for r in temperature_weights(df, alpha=0.5).collect()}
    assert got["big"].share == 0.9 and got["small"].share == 0.1
    assert got["big"].target_share == 0.75 and got["small"].target_share == 0.25
    assert abs(got["big"].weight - 0.833333) < 1e-6
    assert got["small"].weight == 2.5
    # alpha=1 keeps natural proportions: every weight is 1
    nat = temperature_weights(df, alpha=1.0).collect()
    assert all(r.weight == 1.0 for r in nat)


def test_temperature_weights_drops_zero_token_source(spark):
    from json_schema_modern_spark.operators.mixing import temperature_weights

    df = spark.createDataFrame(
        [("a", 50), ("empty", 0)], "source string, n_tok int")
    rows = temperature_weights(df, alpha=0.5).collect()
    assert [r.source for r in rows] == ["a"]
    assert rows[0].weight == 1.0


def test_top_fraction_cutoff_and_ties(spark):
    from json_schema_modern_spark.operators.funnel import top_fraction_filter

    # scores: 9,8,7,7,7,1 -> n=6, target 3/10 -> floor(18/10)=1... use
    # 5/10: target 3; cumulative desc 9(1) 8(2) 7(5): cutoff=7, ties keep
    rows = [(i, "s", float(sc)) for i, sc in
            enumerate([9, 8, 7, 7, 7, 1])]
    df = spark.createDataFrame(rows, "doc_id long, source string, score double")
    got = {r.doc_id: r.keep for r in
           top_fraction_filter(df, 5, 10, score_col="score").collect()}
    assert got == {0: True, 1: True, 2: True, 3: True, 4: True, 5: False}


def test_top_fraction_zero_target_and_overfull(spark):
    from json_schema_modern_spark.operators.funnel import top_fraction_filter

    df = spark.createDataFrame(
        [(1, "tiny", 5.0), (2, "tiny", 3.0)],
        "doc_id long, source string, score double")
    # 1/10 of 2 rows floors to target 0: nothing keeps
    got = {r.doc_id: r.keep for r in
           top_fraction_filter(df, 1, 10, score_col="score").collect()}
    assert got == {1: False, 2: False}
    # fraction > 1 clamps to n: everything keeps
    got = {r.doc_id: r.keep for r in
           top_fraction_filter(df, 15, 10, score_col="score").collect()}
    assert got == {1: True, 2: True}


def test_top_fraction_null_scores_never_keep(spark):
    from json_schema_modern_spark.operators.funnel import top_fraction_filter

    df = spark.createDataFrame(
        [(1, "s", 5.0), (2, "s", None), (3, "s", 1.0), (4, "s", 4.0)],
        "doc_id long, source string, score double")
    # 3 non-null scores, 2/3 -> target 2 -> cutoff 4.0
    got = {r.doc_id: r.keep for r in
           top_fraction_filter(df, 2, 3, score_col="score").collect()}
    assert got == {1: True, 2: False, 3: False, 4: True}


def test_embedding_contamination_matmul_matches_jvm(spark):
    from json_schema_modern_spark.operators.contamination import (
        embedding_contamination,
    )

    bench = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0]), (101, [0.0, 1.0, 0.0]),
         (102, [0.0, 0.0, 0.0])],              # zero-norm bench: never wins
        "vec_id long, embedding array<float>")
    train = spark.createDataFrame(
        [(1, [2.0, 0.0, 0.0]), (2, [0.0, 0.0, 5.0]), (3, [1.0, 1.0, 0.0]),
         (4, [0.0, 0.0, 0.0])],                # zero-norm train: NULL max_sim
        "vec_id long, embedding array<float>")
    mm = {r.vec_id: (r.max_sim, r.contaminated) for r in
          embedding_contamination(train, bench, 0.8, method="matmul").collect()}
    assert mm[1] == (1.0, True)
    assert mm[2] == (0.0, False)
    assert abs(mm[3][0] - 0.707107) < 1e-6 and mm[3][1] is False
    assert mm[4] == (None, None)
    # jvm path agrees on every non-zero-norm row (zero-norm division
    # semantics are the documented JVM-path edge; matmul pins them)
    jvm = {r.vec_id: (r.max_sim, r.contaminated) for r in
           embedding_contamination(
               train.where("vec_id < 4"),
               bench.where("vec_id < 102"), 0.8, method="jvm").collect()}
    for k in (1, 2, 3):
        assert jvm[k] == mm[k]


def test_encoding_quality(spark):
    from json_schema_modern_spark.operators.text import encoding_quality

    df = spark.createDataFrame(
        [("a", "clean ascii text."),
         ("b", "bad � char and \x01 control"),
         ("c", "mojibake Ã© and â€™ artifacts"),
         ("d", "café non-ascii but sane"),
         ("e", None)],
        "doc_id string, text string")
    got = {r.doc_id: r for r in encoding_quality(df).collect()}
    assert got["a"].encoding_ok and got["a"].n_non_ascii == 0
    assert got["b"].n_replacement == 1 and got["b"].n_control == 1
    assert not got["b"].encoding_ok
    assert got["c"].n_mojibake == 2 and not got["c"].encoding_ok
    # é is non-ascii but NOT mojibake/control -> ok
    assert got["d"].n_non_ascii == 1 and got["d"].encoding_ok
    assert got["e"].n_chars == 0 and got["e"].encoding_ok


def test_encoding_quality_oracle_agrees_on_nonascii(spark):
    """sf parquet text is pure ASCII, so the driver parity can't catch a
    divergent mojibake/control pattern between Java regex (Spark) and RE2
    (DuckDB) — pin cross-engine agreement on text that actually hits every
    class."""
    import duckdb

    from json_schema_modern_spark.operators.text import (
        ENC_CONTROL, ENC_MOJIBAKE, ENC_NON_ASCII, ENC_REPLACEMENT,
        encoding_quality,
    )

    rows = [("a", "clean ascii text."),
            ("b", "bad \N{REPLACEMENT CHARACTER} char and \x01 control"),
            ("c", "mojibake Ã© and â€™ artifacts"),
            ("d", "café non-ascii but sane"),
            ("e", None)]
    sp = {r.doc_id: r for r in encoding_quality(
        spark.createDataFrame(rows, "doc_id string, text string")).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    for col, pat in (("n_replacement", ENC_REPLACEMENT),
                     ("n_control", ENC_CONTROL),
                     ("n_non_ascii", ENC_NON_ASCII),
                     ("n_mojibake", ENC_MOJIBAKE)):
        duck = dict(con.execute(
            "SELECT doc_id, coalesce(len(regexp_extract_all(text, ?)), 0) "
            "FROM documents", [pat]).fetchall())
        for doc_id, want in duck.items():
            assert sp[doc_id][col] == want, (col, doc_id)


def test_gopher_rules(spark):
    from json_schema_modern_spark.operators.text import gopher_rules

    good = ("the quick brown fox jumps over the lazy dog and then "
            "it went to have a rest with all of that energy spent " * 3)
    bullets = "\n".join(f"- item {i}" for i in range(10))
    ellipsis = "\n".join("the thing of and that have with be to..." for _ in range(10))
    symbols = "# " * 60 + "the of and be to have with that"
    df = spark.createDataFrame(
        [("good", good), ("short", "tiny doc"), ("bullets", bullets),
         ("ellipsis", ellipsis), ("symbols", symbols), ("nul", None)],
        "doc_id string, text string")
    got = {r.doc_id: r for r in gopher_rules(df, min_words=20).collect()}

    g = got["good"]
    assert g.gopher_pass and g.rule_word_count and g.rule_stopwords
    assert got["short"].rule_word_count is False
    assert not got["short"].gopher_pass
    b = got["bullets"]
    assert b.bullet_frac == 1.0 and b.rule_bullets is False
    e = got["ellipsis"]
    assert e.ellipsis_frac == 1.0 and e.rule_ellipsis is False
    s = got["symbols"]
    assert s.symbol_ratio > 0.1 and s.rule_symbol_ratio is False
    n = got["nul"]
    assert n.n_words == 0 and n.gopher_pass is False


def test_gopher_rules_oracle_agrees_on_adversarial(spark):
    """sf text has no bullets/ellipsis/symbol spam, so the driver parity
    exercises only the happy path — replay the full oracle SQL on rows
    that trip every rule and compare engine-by-engine."""
    import duckdb

    import __spark_entry__ as E
    from json_schema_modern_spark.operators.text import gopher_rules

    rows = [("good", "the quick brown fox and that have with be to " * 5),
            ("bullets", "\n".join(f"- item {i}" for i in range(10))),
            ("ellipsis", "\n".join("of and that..." for _ in range(8))),
            ("symbols", "# " * 40 + "the of and be to have with that"),
            ("nul", None)]
    sp = {r.doc_id: r.asDict() for r in gopher_rules(
        spark.createDataFrame(rows, "doc_id string, text string"),
        min_words=20).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    cur = con.execute(E.oracle_sql()["text_gopher_rules"])
    cols = [d[0] for d in cur.description]
    for rec in cur.fetchall():
        d = dict(zip(cols, rec))
        for c in cols:
            assert sp[d["doc_id"]][c] == d[c], (d["doc_id"], c)


def test_c4_clean(spark):
    from json_schema_modern_spark.operators.text import c4_clean

    doc = ("This line ends properly and is long enough.\n"
           "no terminal punctuation here\n"
           "Too short.\n"
           "Enable javascript to view this page please now.\n"
           "Another good sentence stays in the output!\n")
    df = spark.createDataFrame(
        [("a", doc),
         ("b", "Contains lorem ipsum filler here ok.\nGood line here too."),
         ("c", "code spill { int x = 0; } more words here."),
         ("d", "One good retained sentence right here today.\n"),
         ("e", None)],
        "doc_id string, text string")
    got = {r.doc_id: r for r in
           c4_clean(df, min_line_words=5, min_kept_lines=1).collect()}

    a = got["a"]
    assert a.n_kept_lines == 2 and a.doc_keep
    assert a.clean_text == (
        "This line ends properly and is long enough.\n"
        "Another good sentence stays in the output!")
    assert got["b"].has_lorem and not got["b"].doc_keep
    assert got["c"].has_brace and not got["c"].doc_keep
    assert got["d"].doc_keep and got["d"].n_kept_lines == 1
    e = got["e"]
    assert e.n_lines == 0 and not e.doc_keep and e.clean_text == ""


def test_c4_clean_oracle_agrees_on_adversarial(spark):
    import duckdb

    import __spark_entry__ as E
    from json_schema_modern_spark.operators.text import c4_clean

    rows = [("a", "Good line ok.\nbad line\nEnable javascript now here.\n"),
            ("b", "lorem ipsum but Fine line here.\n"),
            ("c", "brace { doc but Fine line here.\n"),
            ("d", 'Quoted line "\nShort.\n'),
            # trailing-space line: regression for the bare-F.trim overload
            # bug (transform passed the index as trimStr, no-op trim)
            ("f", "Kept despite trailing space here. \nnope\n"),
            ("e", None)]
    sp = {r.doc_id: r.asDict() for r in c4_clean(
        spark.createDataFrame(rows, "doc_id string, text string"),
        min_line_words=3, min_kept_lines=1).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    cur = con.execute(E.oracle_sql()["text_c4_clean"])
    cols = [d[0] for d in cur.description]
    for rec in cur.fetchall():
        d = dict(zip(cols, rec))
        for c in cols:
            assert sp[d["doc_id"]][c] == d[c], (d["doc_id"], c)


def test_chunk_sequences(spark):
    import pytest as _pytest

    from json_schema_modern_spark.operators.packing import chunk_sequences

    df = spark.createDataFrame(
        [("a", list(range(10))),   # 10 toks: starts 0,4,8 @ stride 4
         ("b", [1, 2]),            # shorter than min_tail at start 0? n=2>=2
         ("c", []), ("d", None)],
        "doc_id string, tokens array<int>")
    got = chunk_sequences(df, seq_len=6, stride=4, min_tail=2).collect()
    by = {}
    for r in got:
        by.setdefault(r.doc_id, {})[r.chunk_idx] = r
    # doc a: start 0 -> [0..5], start 4 -> [4..9], start 8 -> [8,9]
    assert [by["a"][i].chunk_tokens for i in (0, 1, 2)] == \
        [[0, 1, 2, 3, 4, 5], [4, 5, 6, 7, 8, 9], [8, 9]]
    assert by["a"][2].n_chunk_tok == 2
    assert by["b"][0].chunk_tokens == [1, 2]
    assert "c" not in by and "d" not in by
    # min_tail drops the 2-token tail
    got2 = chunk_sequences(df, seq_len=6, stride=4, min_tail=3).collect()
    assert sorted(r.chunk_idx for r in got2 if r.doc_id == "a") == [0, 1]
    with _pytest.raises(ValueError):
        chunk_sequences(df, seq_len=0)


def test_validation_keyword_rollup_multi_keyword(spark):
    """sf corpora trip only one flagship branch, so the driver row is a
    1-row rollup — exercise a multi-keyword taxonomy here."""
    from json_schema_modern_spark import Validator

    spec = {"type": "object",
            "required": ["a", "b"],
            "properties": {"a": {"minimum": 0},
                           "b": {"maxLength": 3}}}
    df = spark.createDataFrame(
        [(1, -5, "xx"), (2, 1, "toolong"), (3, -1, "toolong"),
         (4, None, "ok"), (5, 2, None)],
        "id int, a int, b string")
    res = Validator(spec).validate(df, id_cols=["id"])
    got = {(r.keyword): r.n_violations for r in
           res.violations.groupBy("keyword")
              .agg(F.count(F.lit(1)).alias("n_violations")).collect()}
    assert got["minimum"] == 2
    assert got["maxLength"] == 2
    assert got["required"] == 2


def test_collapse_token_runs(spark):
    from json_schema_modern_spark.operators.tokens import collapse_token_runs

    df = spark.createDataFrame(
        [("a", [1, 1, 1, 2, 3, 3, 1]), ("b", [5]), ("c", []), ("d", None)],
        "doc_id string, tokens array<int>")
    got = {r.doc_id: r for r in collapse_token_runs(df).collect()}
    assert got["a"].tokens_clean == [1, 2, 3, 1] and got["a"].n_removed == 3
    assert got["b"].tokens_clean == [5] and got["b"].n_removed == 0
    assert got["c"].n_tok == 0 and got["d"].n_tok == 0


def test_normalize_text_and_oracle(spark):
    import duckdb

    import __spark_entry__ as E
    from json_schema_modern_spark.operators.text import normalize_text

    rows = [("a", "  Hello\t\tWorld \n\n again "),
            ("b", "ctrl\x01char\x7fhere"),
            ("c", None)]
    sp = {r.doc_id: r for r in normalize_text(
        spark.createDataFrame(rows, "doc_id string, text string")).collect()}
    assert sp["a"].norm_text == "hello world again"
    assert sp["b"].norm_text == "ctrlcharhere"
    assert sp["c"].norm_text == "" and sp["c"].n_chars_norm == 0

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    for doc_id, norm, n in con.execute(
            E.oracle_sql()["text_normalize"]).fetchall():
        assert sp[doc_id].norm_text == norm and sp[doc_id].n_chars_norm == n


def test_compression_ratio(spark):
    from json_schema_modern_spark.operators.text import compression_ratio

    df = spark.createDataFrame(
        [("rep", "abc " * 500),
         ("prose", "The weather turned unexpectedly cold last Tuesday "
                   "evening, and the gulls wheeled inland ahead of it."),
         ("empty", ""), ("nul", None)],
        "doc_id string, text string")
    got = {r.doc_id: r for r in compression_ratio(df).collect()}
    assert got["rep"].low_info and got["rep"].ratio < 0.05
    assert not got["prose"].low_info and got["prose"].ratio > 0.5
    assert got["empty"].ratio is None and not got["empty"].low_info
    assert got["nul"].n_bytes == 0
    # deterministic across runs (fixed level, byte-exact input)
    again = {r.doc_id: r.n_compressed for r in compression_ratio(df).collect()}
    assert all(got[k].n_compressed == v for k, v in again.items())


def test_duplication_rate(spark):
    from json_schema_modern_spark.operators.dedup import duplication_rate

    df = spark.createDataFrame(
        [("1", "AAA", "s1"), ("2", "AAA", "s1"),   # within-group dup
         ("3", "BBB", "s1"),                        # unique
         ("4", "CCC", "s2"), ("5", "CCC", "s1"),   # cross-group dup
         ("6", "DDD", "s2")],
        "doc_id string, text string, source string")
    got = {r.source: r for r in duplication_rate(df).collect()}
    s1 = got["s1"]
    assert s1.n_docs == 4 and s1.n_unique_texts == 3
    assert s1.n_dup_docs == 3      # two AAA copies + the CCC copy
    assert s1.dup_frac == 0.75
    s2 = got["s2"]
    assert s2.n_docs == 2 and s2.n_dup_docs == 1 and s2.dup_frac == 0.5


def test_quality_gate_cube(spark):
    import duckdb

    import __spark_entry__ as E
    from json_schema_modern_spark.operators.text import quality_gate_cube

    good = ("The quick brown fox jumps over the lazy dog and that was "
            "all of it, with more to have and to be said today. " * 3)
    rows = [("all_pass", good),
            ("enc_fail", good + " bad \N{REPLACEMENT CHARACTER} byte."),
            ("gopher_fail", "Too short to pass but a fine sentence."),
            ("c4_fail", good + " lorem ipsum"),
            ("nul", None)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    kw = dict(gopher_kwargs={"min_words": 20},
              c4_kwargs={"min_line_words": 3, "min_kept_lines": 1})
    cube = quality_gate_cube(df, **kw)
    got = {(r.encoding_ok, r.gopher_pass, r.c4_keep): r.n_docs
           for r in cube.collect()}
    assert got[(True, True, True)] == 1
    assert got[(False, True, True)] == 1       # enc_fail
    assert got[(True, False, True)] == 1       # gopher_fail (short)
    assert got[(True, True, False)] == 1       # c4_fail (lorem)
    assert got[(True, False, False)] == 1      # nul: no words, no lines
    # zero joins / zero extra scans: one Scan, no Exchange besides the agg
    # (AQE prints final + initial sections — inspect the final one only)
    plan = cube._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Scan ") <= 1 and "Join" not in final

    # cross-engine parity on the same adversarial rows
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    duck = {(bool(e), bool(g), bool(c)): n for e, g, c, n in
            con.execute(E.oracle_sql()["text_gate_cube"]).fetchall()}
    assert duck == got


def test_minhash_pair_similarity_hist(spark):
    from json_schema_modern_spark.operators.dedup import (
        minhash_pair_similarity_hist,
    )

    base = ("the quick brown fox jumps over the lazy dog while rain "
            "fell softly on the quiet northern village all afternoon")
    near = base.replace("softly", "gently")
    df = spark.createDataFrame(
        [("1", base), ("2", base),          # exact dup -> est 1.0
         ("3", near),                        # near dup of 1/2
         ("4", "completely unrelated text about spacecraft telemetry "
               "budgets and the committee meeting next tuesday morning")],
        "doc_id string, text string")
    got = {r.bucket: r for r in minhash_pair_similarity_hist(df).collect()}
    # identical signatures collide in every band, so the exact pair is a
    # guaranteed candidate and its estimator is exactly 1.0 -> bucket 9;
    # near-dup recall on such short docs is probabilistic, so assert only
    # bucket bounds for any extra pairs
    assert got[9].n_pairs >= 1 and got[9].est_lo == 0.9
    assert all(0 <= b <= 9 for b in got)


def test_language_confusion_cells_and_row_norm(spark):
    from json_schema_modern_spark.operators.text import language_confusion

    df = spark.createDataFrame(
        [
            # labeled en, clearly en
            (1, "the cat and the dog of it is that", "en"),
            (2, "a man of the house is in it for the win", "en"),
            # labeled es but English stopwords -> off-diagonal cell
            (3, "the quick brown fox is in the yard", "es"),
            # labeled es, clearly es
            (4, "el perro y la casa de que un por con los", "es"),
        ],
        "doc_id long, text string, lang string",
    )
    rows = {(r.lang, r.pred_lang): r for r in language_confusion(df).collect()}
    assert rows[("en", "en")].n_docs == 2
    assert rows[("es", "en")].n_docs == 1
    assert rows[("es", "es")].n_docs == 1
    # row-normalized within the labeled language
    assert rows[("en", "en")].frac == 1.0
    assert rows[("es", "en")].frac == 0.5
    assert rows[("es", "es")].frac == 0.5


def test_embedding_outliers_ranking_and_distance(spark):
    from json_schema_modern_spark.operators.similarity import embedding_outliers

    # label 0: three points at the corners of a line; centroid = (1, 0)
    # -> id 3 at (4, 0) is farthest (dist 3), then id 1 at (0,0) dist 1.
    df = spark.createDataFrame(
        [
            (1, [0.0, 0.0], 0),
            (2, [-1.0, 0.0], 0),
            (3, [4.0, 0.0], 0),
            (10, [0.0, 1.0], 1),
            (11, [0.0, 3.0], 1),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    out = embedding_outliers(df, top_k=2).collect()
    by_label = {}
    for r in out:
        by_label.setdefault(r.label, []).append(r)
    l0 = sorted(by_label[0], key=lambda r: r.rank)
    assert [r.vec_id for r in l0] == [3, 2]
    assert math.isclose(l0[0].dist, 3.0, abs_tol=1e-6)
    assert math.isclose(l0[1].dist, 2.0, abs_tol=1e-6)
    # label 1 centroid = (0, 2); both at dist 1, tie broken by vec_id
    l1 = sorted(by_label[1], key=lambda r: r.rank)
    assert [r.vec_id for r in l1] == [10, 11]
    assert math.isclose(l1[0].dist, 1.0, abs_tol=1e-6)


def test_embedding_outliers_parallelism_invariant(spark):
    """The quantized-integer centroid makes the output hash independent of
    partitioning / accumulation order: 1 partition == 13 partitions."""
    from json_schema_modern_spark.operators.similarity import embedding_outliers

    import random

    rnd = random.Random(7)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(8)], i % 3)
            for i in range(120)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    a = sorted(map(tuple, embedding_outliers(df.coalesce(1), top_k=4).collect()))
    b = sorted(map(tuple, embedding_outliers(df.repartition(13), top_k=4).collect()))
    assert a == b


def test_tfidf_top_terms_hand_computed(spark):
    from json_schema_modern_spark.operators.text import tfidf_top_terms

    # "rare" appears in 1 of 3 docs; "common" in all 3.  N=3:
    # idf(rare) = ln(4/2) = ln 2, idf(common) = ln(4/4) = 0.
    df = spark.createDataFrame(
        [
            (1, "common rare rare common common"),
            (2, "common word word"),
            (3, "common only here"),
        ],
        "doc_id long, text string",
    )
    out = {(r.doc_id, r.rank): r for r in tfidf_top_terms(df, top_k=2).collect()}
    top1 = out[(1, 1)]
    assert top1.term == "rare" and top1.tf == 2
    assert math.isclose(top1.score, 2 * math.log(2.0), abs_tol=1e-6)
    # doc 1's "common": tf=3 but idf=0 -> score 0, still emitted at rank 2
    assert out[(1, 2)].term == "common" and out[(1, 2)].score == 0.0
    # doc 2: "word" tf=2 idf=ln(2) beats "common"
    assert out[(2, 1)].term == "word"
    assert math.isclose(out[(2, 1)].score, 2 * math.log(2.0), abs_tol=1e-6)


def test_tfidf_tie_break_and_topk_bound(spark):
    from json_schema_modern_spark.operators.text import tfidf_top_terms

    # two singleton terms with identical tf/df -> identical score; tie
    # must break lexicographically by term
    df = spark.createDataFrame(
        [(1, "zebra apple"), (2, "filler filler")],
        "doc_id long, text string",
    )
    rows = sorted(
        (r for r in tfidf_top_terms(df, top_k=5).collect() if r.doc_id == 1),
        key=lambda r: r.rank,
    )
    assert [r.term for r in rows] == ["apple", "zebra"]


def test_centroid_distance_matrix_hand_computed(spark):
    from json_schema_modern_spark.operators.similarity import (
        centroid_distance_matrix,
    )

    # label 0 centroid (0,0); label 1 centroid (3,4) -> dist 5
    df = spark.createDataFrame(
        [
            (1, [1.0, 1.0], 0), (2, [-1.0, -1.0], 0),
            (3, [2.0, 4.0], 1), (4, [4.0, 4.0], 1),
            (5, [0.0, 6.0], 2),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    out = {(r.label_a, r.label_b): r.dist
           for r in centroid_distance_matrix(df).collect()}
    assert set(out) == {(0, 1), (0, 2), (1, 2)}
    assert math.isclose(out[(0, 1)], 5.0, abs_tol=1e-6)
    assert math.isclose(out[(0, 2)], 6.0, abs_tol=1e-6)
    assert math.isclose(out[(1, 2)], math.sqrt(9 + 4), abs_tol=1e-6)


def test_validate_transition_one_scan_and_cells(spark):
    """Schema-evolution transition matrix: both specs' validity columns
    evaluate in ONE pass over one scan, and the four (ok_old, ok_new)
    cells land where the keyword changes say they must."""
    from pyspark.sql import functions as F

    from json_schema_modern_spark import Validator

    import __spark_entry__ as E

    rows = [
        # stays valid under both
        (1, "x" * 100, "en", "src1", 100),
        # newly broken: text length in [60, 80) passes v1, fails v2
        (2, "x" * 70, "en", "src1", 100),
        # newly broken: n_chars in (500, 600] passes v1, fails v2
        (3, "x" * 100, "en", "src1", 550),
        # fixed: lang outside the v1 enum, fine once the enum is dropped
        (4, "x" * 100, "xx", "src1", 100),
        # stays broken: bad source pattern under both
        (5, "x" * 100, "en", "bad", 100),
    ]
    df = spark.createDataFrame(
        rows, "doc_id int, text string, lang string, source string, n_chars int")
    out = (df.select("source",
                     Validator(E.FLAGSHIP_SPEC).valid_col(df).alias("ok_old"),
                     Validator(E.FLAGSHIP_SPEC_V2).valid_col(df).alias("ok_new"))
             .groupBy("source", "ok_old", "ok_new")
             .agg(F.count(F.lit(1)).cast("long").alias("n_rows")))
    got = {(r.source, r.ok_old, r.ok_new): r.n_rows for r in out.collect()}
    assert got[("src1", True, True)] == 1
    assert got[("src1", True, False)] == 2    # newly broken
    assert got[("src1", False, True)] == 1    # fixed
    assert got[("bad", False, False)] == 1    # stays broken
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Scan ") <= 1 and "Join" not in final
