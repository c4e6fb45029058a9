"""End-to-end validation pipeline: spec + token table → violations,
per-partition results, metrics — resumable from checkpoint with
per-partition lineage.

This is the data-plane analogue of the reference's evaluate() lifecycle
(/root/reference/lib/JSON/Schema/Modern.pm:383-489): compile once on the
driver (traverse phase), broadcast the compiled plan implicitly through the
DataFrame closures, run whole-column passes, assemble a Result.  The
resumability design follows SURVEY.md §7.5 — no reference analogue; the
closest idea is the reference's serialization caching of the compiled
evaluator (Modern.pm:1259-1279), applied here to the data plane.

Checkpoint model (works on plain parquet; Iceberg snapshot-pinning slots in
through TableIO when a catalog exists):

- a run is keyed by (snapshot_id, spec fingerprint) — same input + same
  spec ⇒ same run, mirroring the reference's MD5 document dedup
  (Modern.pm:186-197);
- rows are bucketed by ``pmod(xxhash64(doc_id), n_buckets)``; a bucket is
  the unit of restart.  Because the bucket key is a hash of the uniqueness
  key, duplicate doc_ids always land in the same bucket, so the salted
  uniqueness check is per-bucket-complete — no cross-bucket pass needed;
- violations are written partitioned by bucket with dynamic partition
  overwrite (idempotent re-run of a half-finished bucket);
- a lineage row (run_id, snapshot, fingerprint, bucket, status, counts) is
  appended only AFTER the bucket's violation write commits;
- resume = read lineage, anti-join done buckets, process the rest;
- global checks that need all rows (KS drift per source) run as a final
  step recorded under bucket = -1.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from json_schema_modern_spark.compiler.column_compiler import SetCheck
from json_schema_modern_spark.operators.drift import drift_violations, ks_drift
from json_schema_modern_spark.operators.referential import referential_violations
from json_schema_modern_spark.operators.stats import column_stats, numeric_histogram
from json_schema_modern_spark.operators.uniqueness import uniqueness_violations
from json_schema_modern_spark.validator import Validator

VIOL_COLS = [
    "doc_id", "instance_location", "keyword_location",
    "absolute_keyword_location", "keyword", "error", "offending_value",
]

LINEAGE_SCHEMA = (
    "run_id string, snapshot_id string, spec_fingerprint string, "
    "bucket int, status string, doc_count long, error_count long, "
    "updated_at double"
)


@dataclass
class PipelineResult:
    run_id: str
    violations: DataFrame | None      # all violation rows for this run
    stats: DataFrame | None           # column_stats output
    histogram: DataFrame | None       # token-length histogram
    partition_results: DataFrame | None
    buckets_done: int = 0
    buckets_skipped: int = 0
    counts: dict = field(default_factory=dict)


class ValidationPipeline:
    """Compile a spec once; run the full pass tower over a token table.

    ``workdir=None`` runs everything in-memory (tests / bench); with a
    workdir, per-bucket checkpointing and resume are active.
    """

    def __init__(
        self,
        spec: dict,
        *,
        id_col: str = "doc_id",
        workdir: str | None = None,
        n_buckets: int = 16,
        drift_bins: int = 256,
        drift_hi: float = 2048.0,
        options=None,
        extra_schemas: list | None = None,
    ):
        self.spec = spec
        self.id_col = id_col
        if workdir is not None and "://" in workdir and not workdir.startswith("file://"):
            # checkpoint cleanup + lineage appends use os-level file ops;
            # a remote URI (hdfs://, s3a://) would silently no-op the
            # stale-partition deletes and corrupt resume semantics.
            raise ValueError(
                "workdir must be a local filesystem path (remote URIs are "
                "not supported; point workdir at a shared local mount)")
        self.workdir = workdir[7:] if workdir and workdir.startswith("file://") else workdir
        self.n_buckets = n_buckets
        self.drift_bins = drift_bins
        self.drift_hi = drift_hi
        self.validator = Validator(spec, options, extra_schemas=extra_schemas)

    @classmethod
    def resume_from(cls, workdir: str, *,
                    fingerprint: str | None = None) -> "ValidationPipeline":
        """Rebuild a pipeline from a checkpoint directory WITHOUT the spec
        in hand and WITHOUT re-running the traverse phase: thaws the
        validator persisted by ``run()`` (the reference's serialize→thaw
        evaluator caching, Modern.pm:1259-1279) and restores the run
        geometry from the manifest.  Compiled Column expressions are
        session-bound and re-derive lazily on first validate — the
        analogue of the reference re-adding coderefs after THAW."""
        # same workdir normalization/validation as __init__: strip
        # file://, reject remote URIs explicitly (otherwise the open()
        # below fails with an opaque ENOENT on "hdfs:/..." paths)
        if "://" in workdir and not workdir.startswith("file://"):
            raise ValueError(
                "workdir must be a local filesystem path (remote URIs are "
                "not supported; point workdir at a shared local mount)")
        if workdir.startswith("file://"):
            workdir = workdir[7:]
        with open(os.path.join(workdir, "run_manifest.json")) as f:
            manifest = json.load(f)
        fp = fingerprint or manifest["spec_fingerprint"]
        validator = Validator.load(os.path.join(workdir, f"plan_{fp}.json"))
        pipe = cls.__new__(cls)
        pipe.spec = validator.spec
        pipe.id_col = manifest.get("id_col", "doc_id")
        pipe.workdir = workdir
        pipe.n_buckets = manifest["n_buckets"]
        pipe.drift_bins = manifest.get("drift_bins", 256)
        pipe.drift_hi = manifest.get("drift_hi", 2048.0)
        pipe.validator = validator
        return pipe

    # -- lineage ------------------------------------------------------------

    def _lineage_path(self) -> str:
        return os.path.join(self.workdir, "lineage")

    def _read_lineage(self, spark: SparkSession) -> DataFrame:
        p = self._lineage_path()
        if self.workdir and os.path.exists(p):
            return spark.read.schema(LINEAGE_SCHEMA).parquet(p)
        return spark.createDataFrame([], LINEAGE_SCHEMA)

    def _append_lineage(self, spark: SparkSession, rows: list[tuple]) -> None:
        spark.createDataFrame(rows, LINEAGE_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(self._lineage_path())

    def done_buckets(self, spark: SparkSession, snapshot_id: str, fingerprint: str) -> set[int]:
        lin = self._read_lineage(spark)
        rows = (
            lin.filter(
                (F.col("snapshot_id") == snapshot_id)
                & (F.col("spec_fingerprint") == fingerprint)
                & (F.col("status") == "done")
            )
            .select("bucket").distinct().collect()
        )
        return {r.bucket for r in rows}

    # -- per-bucket row-local + bucket-safe set checks ----------------------

    def _bucket_violations(self, bucketed: DataFrame, source_dict: DataFrame | None) -> DataFrame:
        """All checks that are complete within a hash bucket of doc_id:
        row-local keywords, doc_id uniqueness (hash-colocated), and the
        referential semijoin (row-local w.r.t. the broadcast dictionary)."""
        res = self.validator.validate(bucketed, id_cols=[self.id_col, "_bucket"])
        viols = res.violations.select(
            F.col(self.id_col).cast("string").alias("doc_id"),
            *VIOL_COLS[1:], F.col("_bucket"),
        )
        plan = self.validator.compile_for(bucketed)

        for check in plan.set_checks:
            extra = self._bucket_set_check(check, bucketed, source_dict)
            if extra is not None:
                viols = viols.unionByName(extra)
        return viols

    def _bucket_set_check(
        self, check: SetCheck, bucketed: DataFrame, source_dict: DataFrame | None
    ) -> DataFrame | None:
        val = check.params["value"]
        if check.kind == "unique":
            cols = val if isinstance(val, list) else [val]
            if cols != [self.id_col]:
                # rows are bucketed by hash(id_col); a resume over pending
                # buckets would miss cross-bucket duplicates of any OTHER
                # key — those checks run in the global (bucket=-1) pass
                return None
            out = uniqueness_violations(bucketed, cols, keyword_location=check.keyword_location)
            # duplicates of id_col are colocated in its hash bucket
            return out.withColumn("_bucket", _bucket_expr(F.col("doc_id"), self.n_buckets))
        if check.kind == "ref":
            if source_dict is None:
                return None
            viols = []
            for fact_col, target in val.items():
                # spec forms: "dict.col" (broadcast, the small-dim default)
                # or {"target": "dict.col", "strategy": "sortmerge"} for
                # large dictionaries — salted sort-merge: fact side gets a
                # salt, dim side replicates ×S, bounding any hot key's
                # reducer at 1/S (north rule: explicit repartition + skew
                # salting on the source column)
                if isinstance(target, dict):
                    dim_col = target["target"].split(".")[-1]
                    strategy = target.get("strategy", "broadcast")
                else:
                    dim_col = target.split(".")[-1]
                    strategy = "broadcast"
                v = referential_violations(
                    bucketed, fact_col, source_dict, dim_col,
                    id_col=self.id_col, keyword_location=check.keyword_location,
                    strategy=strategy,
                ).withColumn("_bucket", _bucket_expr(F.col("doc_id"), self.n_buckets))
                viols.append(v)
            out = viols[0]
            for v in viols[1:]:
                out = out.unionByName(v)
            return out
        return None  # drift is global — handled in _global_violations

    def _global_violations(self, df: DataFrame) -> DataFrame | None:
        """Checks needing the whole table: KS drift per group, and
        uniqueness on keys other than id_col (not bucket-complete)."""
        plan = self.validator.compile_for(df.drop("_bucket") if "_bucket" in df.columns else df)
        outs = []
        for check in plan.set_checks:
            if check.kind == "unique":
                cols = (check.params["value"] if isinstance(check.params["value"], list)
                        else [check.params["value"]])
                if cols != [self.id_col]:
                    outs.append(uniqueness_violations(
                        df, cols, keyword_location=check.keyword_location))
                continue
            if check.kind != "drift":
                continue
            for value_col, cfg in check.params["value"].items():
                group_col = cfg.get("per", "source")
                test = cfg.get("test", "ks")
                if test == "psi":
                    from json_schema_modern_spark.operators.drift import (
                        psi_drift, psi_violations,
                    )

                    d = psi_drift(df, value_col, group_col, 0.0, self.drift_hi,
                                  min(self.drift_bins, 64),
                                  threshold=float(cfg.get("threshold", 0.2)))
                    outs.append(psi_violations(
                        d, group_col, value_col,
                        keyword_location=check.keyword_location))
                    continue
                alpha = float(cfg.get("alpha", 0.01))
                d = ks_drift(df, value_col, group_col, 0.0, self.drift_hi,
                             self.drift_bins, alpha=alpha)
                outs.append(
                    drift_violations(d, group_col, value_col,
                                     keyword_location=check.keyword_location))
        if not outs:
            return None
        out = outs[0]
        for o in outs[1:]:
            out = out.unionByName(o)
        return out

    # -- main entry ---------------------------------------------------------

    def run(
        self,
        spark: SparkSession,
        df: DataFrame,
        source_dict: DataFrame | None = None,
        snapshot_id: str = "unpinned",
        resume: bool = True,
        stats_columns: list[str] | None = None,
    ) -> PipelineResult:
        plan = self.validator.compile_for(df.withColumn("_bucket", F.lit(0)))
        fingerprint = plan.fingerprint
        run_id = uuid.uuid4().hex[:12]
        bucketed = df.withColumn("_bucket", _bucket_expr(F.col(self.id_col), self.n_buckets))

        if self.workdir is None:
            return self._run_inmemory(run_id, bucketed, source_dict, stats_columns)

        os.makedirs(self.workdir, exist_ok=True)
        # persist the frozen validator next to the lineage (reference
        # serialization caching, Modern.pm:1259-1279 / README.pod CACHING):
        # a restarted driver resumes via ``ValidationPipeline.resume_from``
        # which thaws this file instead of re-running the traverse phase
        plan_path = os.path.join(self.workdir, f"plan_{fingerprint}.json")
        if not os.path.exists(plan_path):
            self.validator.save(plan_path)
        # manifest lands BEFORE bucket work so a crashed run is resumable
        # (rewritten at the end with the completing run_id)
        _write_manifest(self.workdir, run_id, snapshot_id, fingerprint,
                        self.n_buckets, self.id_col, self.drift_bins,
                        self.drift_hi)
        done = self.done_buckets(spark, snapshot_id, fingerprint) if resume else set()
        pending = [b for b in range(self.n_buckets) if b not in done]

        viol_path = os.path.join(self.workdir, "violations")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

        if pending:
            sub = bucketed.filter(F.col("_bucket").isin(pending))
            viols = self._bucket_violations(sub, source_dict)
            # violations are partitioned by (fp, bucket): runs with a
            # changed spec never see another fingerprint's rows, and
            # dynamic overwrite stays scoped to this spec's partitions.
            # Dynamic overwrite only replaces partitions that RECEIVE
            # rows — a pending bucket whose re-run yields zero violations
            # must still clear stale files, so drop those partition dirs
            # explicitly first (idempotent, pre-commit: lineage marks the
            # bucket done only after the write succeeds).
            for b in pending:
                shutil.rmtree(
                    os.path.join(viol_path, f"fp={fingerprint}", f"bucket={b}"),
                    ignore_errors=True)
            viols.withColumnRenamed("_bucket", "bucket") \
                .withColumn("fp", F.lit(fingerprint)) \
                .write.mode("overwrite").partitionBy("fp", "bucket").parquet(viol_path)
            per_bucket = (
                sub.groupBy("_bucket").agg(F.count(F.lit(1)).alias("n")).collect()
            )
            counts = {r._bucket: r.n for r in per_bucket}
            now = time.time()
            self._append_lineage(spark, [
                (run_id, snapshot_id, fingerprint, b, "done",
                 counts.get(b, 0), None, now)
                for b in pending
            ])

        # global pass (drift, non-id uniqueness) — bucket -1, re-done on
        # every completing run
        gv = self._global_violations(df)
        if pending or -1 not in done:
            shutil.rmtree(
                os.path.join(viol_path, f"fp={fingerprint}", "bucket=-1"),
                ignore_errors=True)
            if gv is not None:
                gv.withColumn("bucket", F.lit(-1)).withColumn("fp", F.lit(fingerprint)) \
                    .write.mode("overwrite").partitionBy("fp", "bucket").parquet(viol_path)
            self._append_lineage(spark, [
                (run_id, snapshot_id, fingerprint, -1, "done", 0, None, time.time())
            ])

        # read this spec's partition subtree directly (never sibling
        # fingerprints' files); a fully-clean run writes no partition files
        # at all — that is an empty violations table, not an error (the CLI
        # must exit 0).  Any OTHER read failure (corrupt files, permission)
        # must propagate: treating it as "no violations" would report a
        # dirty dataset as valid.
        fp_dir = os.path.join(viol_path, f"fp={fingerprint}")
        has_files = any(
            f.endswith(".parquet")
            for _, _, files in os.walk(fp_dir) for f in files)
        if has_files:
            all_viols = spark.read.parquet(fp_dir)
        else:
            all_viols = spark.createDataFrame(
                [], ", ".join(f"{c} string" for c in VIOL_COLS) + ", bucket int")
        stats = column_stats(df, stats_columns or [c for c in df.columns if c != "tokens"])
        hist = (numeric_histogram(df, "n_tok", 0.0, self.drift_hi, 32)
                if "n_tok" in df.columns else None)
        part_res = _partition_results(bucketed, all_viols)
        # metrics tables (north rule: per-partition lineage + metrics):
        # column stats, value histogram, per-bucket pass/fail rollup — tiny
        # outputs, coalesced to one file each
        stats.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(self.workdir, "stats"))
        if hist is not None:
            hist.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(self.workdir, "histogram"))
        part_res.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(self.workdir, "partition_results"))
        # per-keyword violation rollup — the "which checks fire, how often"
        # metrics table (tiny: ≤ #keyword-locations rows)
        all_viols.groupBy("keyword", "keyword_location") \
            .agg(F.count(F.lit(1)).alias("n_violations")) \
            .coalesce(1).write.mode("overwrite").parquet(
                os.path.join(self.workdir, "violation_counts"))
        _write_manifest(self.workdir, run_id, snapshot_id, fingerprint,
                        self.n_buckets, self.id_col, self.drift_bins,
                        self.drift_hi)
        return PipelineResult(
            run_id=run_id, violations=all_viols, stats=stats, histogram=hist,
            partition_results=part_res,
            buckets_done=len(pending),
            buckets_skipped=len({b for b in done if b >= 0}),
        )

    def _run_inmemory(self, run_id, bucketed, source_dict, stats_columns) -> PipelineResult:
        df = bucketed.drop("_bucket")
        viols = self._bucket_violations(bucketed, source_dict).drop("_bucket")
        gv = self._global_violations(df)
        if gv is not None:
            viols = viols.unionByName(gv)
        stats = column_stats(df, stats_columns or [c for c in df.columns if c != "tokens"])
        hist = (numeric_histogram(df, "n_tok", 0.0, self.drift_hi, 32)
                if "n_tok" in df.columns else None)
        return PipelineResult(
            run_id=run_id, violations=viols, stats=stats, histogram=hist,
            partition_results=_partition_results(bucketed, viols.withColumn(
                "bucket", _bucket_expr(F.col("doc_id"), self.n_buckets))),
            buckets_done=self.n_buckets,
        )


def _bucket_expr(col, n_buckets: int):
    return F.pmod(F.xxhash64(col), F.lit(n_buckets)).cast("int")


def _partition_results(bucketed: DataFrame, viols: DataFrame) -> DataFrame:
    """partition_results(partition_id, valid, doc_count, error_count) where
    the partition unit is the checkpoint bucket."""
    bcol = "bucket" if "bucket" in viols.columns else "_bucket"
    per_bucket_docs = bucketed.groupBy(F.col("_bucket").alias("partition_id")) \
        .agg(F.count(F.lit(1)).alias("doc_count"))
    per_bucket_errs = viols.filter(F.col(bcol) >= 0) \
        .groupBy(F.col(bcol).alias("partition_id")) \
        .agg(F.count(F.lit(1)).alias("error_count"))
    return (
        per_bucket_docs.join(per_bucket_errs, "partition_id", "left")
        .select(
            "partition_id",
            F.coalesce("error_count", F.lit(0)).alias("error_count"),
            "doc_count",
        )
        .withColumn("valid", F.col("error_count") == 0)
        .select("partition_id", "valid", "doc_count", "error_count")
    )


def _write_manifest(workdir, run_id, snapshot_id, fingerprint, n_buckets,
                    id_col="doc_id", drift_bins=256, drift_hi=2048.0) -> None:
    with open(os.path.join(workdir, "run_manifest.json"), "w") as f:
        json.dump({
            "run_id": run_id, "snapshot_id": snapshot_id,
            "spec_fingerprint": fingerprint, "n_buckets": n_buckets,
            "id_col": id_col, "drift_bins": drift_bins, "drift_hi": drift_hi,
        }, f, indent=2)
