"""Local replica of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet, compare
row-count + order-insensitive value hash (columns sorted by name).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    # Deliberately STRICT: float vs int (and their renderings) must agree
    # bitwise between Spark and DuckDB — the driver's hash does not forgive
    # type-level drift (e.g. DuckDB HUGEINT → pandas float64).
    if v is None:
        return "\\N"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if v != v:  # NaN
            return "NaN"
        return repr(v)
    return str(v)


def pd_isna_scalar(v):
    try:
        import pandas as pd

        return v is None or (not isinstance(v, (list, tuple, dict)) and pd.isna(v))
    except (TypeError, ValueError):
        return False


def table_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.md5()
    for line in lines:
        h.update(line.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from json_schema_modern_spark import get_spark

    spark = get_spark(app_name="oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"skip  {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            # fetch through pandas, as the driver does: surfaces dtype-level
            # mismatches (HUGEINT→float64) that fetchall() would hide
            odf = con.execute(oracles[name]).df()
            ocols = list(odf.columns)
            orows = [
                tuple(
                    None if pd_isna_scalar(v)
                    else (v.item() if hasattr(v, "item") else v)
                    for v in row
                )
                for row in odf.itertuples(index=False, name=None)
            ]
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        ok_count = len(srows) == len(orows)
        ok_cols = sorted(scols) == sorted(ocols)
        sh = table_hash([tuple(r) for r in srows], scols)
        oh = table_hash(orows, ocols)
        ok_hash = sh == oh
        status = "ok   " if (ok_count and ok_cols and ok_hash) else "FAIL "
        print(f"{status} {name}: rows {len(srows)}/{len(orows)} cols={'=' if ok_cols else sorted(scols)==sorted(ocols) or (sorted(scols), sorted(ocols))} hash={'=' if ok_hash else (sh[:8], oh[:8])}")
        if not (ok_count and ok_cols and ok_hash):
            failures.append(name)
            if len(srows) <= 2000 and len(orows) <= 2000:
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                sset = {tuple(norm_cell(r[i]) for i in order_s) for r in srows}
                oset = {tuple(norm_cell(r[i]) for i in order_o) for r in orows}
                extra_s = list(sset - oset)[:3]
                extra_o = list(oset - sset)[:3]
                if extra_s:
                    print(f"       spark-only: {extra_s}")
                if extra_o:
                    print(f"       oracle-only: {extra_o}")
    print(f"\n{len(failures)} failures: {failures}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
