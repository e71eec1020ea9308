"""Index catalog: persisted index tables + lineage manifests + resume.

Mirrors the reference's catalog/lifecycle machinery Spark-first:

* ``Catalog`` manages N named configs = N indices per corpus
  (``Catalog.java:61-95``); here each config owns a warehouse namespace
  ``<warehouse>/<config-name>/`` holding the ``docs``, ``doc_stats``,
  ``dictionary``, ``postings`` and ``stats`` tables as parquet (Iceberg-shaped
  layout: ``postings`` is directory-partitioned by (field, bucket) so term
  lookups prune partitions, exactly the role Iceberg's bucket(term)
  partition transform would play on a cluster with a real catalog).
* The build state machine follows ``Config.java:52-54,237-250`` /
  ``Catalog.java:104-122``: ``last_updated`` is set to UPDATE_FAILED(-1)
  when a build starts and only replaced by the build-start timestamp after
  EVERY stage commits; NEVER_CREATED(-2) before first build; INVALIDATED(-3)
  when the stored config hash no longer matches (any config change
  invalidates the index, ``Config.java:289-297``).
* Checkpoint/resume (north-rule mandate): every stage writes to
  ``_stage=<name>`` with a ``_manifest.json`` recording the stage input
  fingerprint, row/token metrics and wall time. A re-run with the same
  fingerprint skips completed stages (per-stage lineage); a crashed build
  resumes at the first incomplete stage.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from xltsearch_spark.config import (INDEX_INVALIDATED, INDEX_NEVER_CREATED,
                                    INDEX_UPDATE_FAILED, IndexConfig)
from xltsearch_spark.operators.build import BuildStats, IndexBuilder
from xltsearch_spark.operators.search import SearchEngine

STAGES = ("docs", "runs", "dictionary", "doc_stats", "postings")


class IndexCatalog:
    def __init__(self, spark: SparkSession, warehouse: str,
                 config: IndexConfig | None = None):
        self.spark = spark
        self.config = config or IndexConfig()
        self.root = os.path.join(warehouse, self.config.name)
        os.makedirs(self.root, exist_ok=True)

    # ------------------------- state machine --------------------------------
    def _meta_path(self) -> str:
        return os.path.join(self.root, "stats.json")

    def read_meta(self) -> dict:
        p = self._meta_path()
        if not os.path.exists(p):
            return {"last_updated": INDEX_NEVER_CREATED, "config_hash": None}
        with open(p) as f:
            return json.load(f)

    def _write_meta(self, meta: dict) -> None:
        tmp = self._meta_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=1, sort_keys=True)
        os.replace(tmp, self._meta_path())

    def status(self) -> int:
        """last_updated epoch-ms, or the Config.java:52-54 sentinels."""
        meta = self.read_meta()
        if meta.get("config_hash") is not None and \
                meta["config_hash"] != self.config.config_hash():
            return INDEX_INVALIDATED
        return meta.get("last_updated", INDEX_NEVER_CREATED)

    def delete_index(self) -> None:
        """Config.deleteIndex (Config.java:320-336)."""
        if os.path.exists(self.root):
            shutil.rmtree(self.root)
        os.makedirs(self.root, exist_ok=True)

    # --------------------------- stage plumbing -----------------------------
    def _stage_dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self._stage_dir(stage), "_manifest.json")

    def stage_complete(self, stage: str, fingerprint: str) -> bool:
        p = self._manifest_path(stage)
        if not os.path.exists(p):
            return False
        with open(p) as f:
            m = json.load(f)
        return m.get("status") == "success" and m.get("input_fingerprint") == fingerprint

    def _commit_stage(self, stage: str, fingerprint: str, metrics: dict) -> None:
        m = {"stage": stage, "input_fingerprint": fingerprint, "status": "success",
             "config_hash": self.config.config_hash(), **metrics}
        with open(self._manifest_path(stage), "w") as f:
            json.dump(m, f, indent=1, sort_keys=True)

    def _write_stage(self, stage: str, df: DataFrame, fingerprint: str,
                     partition_by: tuple[str, ...] = ()) -> None:
        t0 = time.time()
        out = self._stage_dir(stage)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(out)
        rows = self.spark.read.parquet(out).count()
        self._commit_stage(stage, fingerprint,
                           {"rows": rows, "wall_ms": int((time.time() - t0) * 1000)})

    def _read_stage(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(self._stage_dir(stage))

    # ------------------------------ build -----------------------------------
    def build(self, corpus: DataFrame, fingerprint: str | None = None,
              build_time_ms: int | None = None, fail_after: str | None = None) -> BuildStats:
        """Full (re)build with per-stage checkpoint/resume.

        ``fingerprint`` identifies the corpus snapshot (e.g. its path +
        version); same fingerprint + completed manifest => stage skipped.
        ``fail_after`` injects a crash after the named stage (resume tests).
        """
        fingerprint = fingerprint or "adhoc"
        meta = self.read_meta()
        start_ms = build_time_ms if build_time_ms is not None else int(time.time() * 1000)
        # crash marker first, like Catalog.java:104-105
        self._write_meta({**meta, "last_updated": INDEX_UPDATE_FAILED,
                          "config_hash": self.config.config_hash()})
        builder = IndexBuilder(self.spark, self.config)

        if not self.stage_complete("docs", fingerprint):
            self._write_stage("docs", builder.docs_stage(corpus), fingerprint)
        if fail_after == "docs":
            raise RuntimeError("injected failure after stage docs")
        docs = self._read_stage("docs")

        if not self.stage_complete("runs", fingerprint):
            self._write_stage("runs", builder.runs_stage(docs), fingerprint)
        if fail_after == "runs":
            raise RuntimeError("injected failure after stage runs")
        runs = self._read_stage("runs")

        stats = builder.stats_stage(docs, runs)
        if not self.stage_complete("dictionary", fingerprint):
            self._write_stage("dictionary", builder.dictionary_stage(runs),
                              fingerprint, partition_by=("bucket",))
        if fail_after == "dictionary":
            raise RuntimeError("injected failure after stage dictionary")

        if not self.stage_complete("doc_stats", fingerprint):
            self._write_stage("doc_stats", builder.doc_norms(runs), fingerprint)

        if not self.stage_complete("postings", fingerprint):
            self._write_stage("postings", builder.postings_stage(runs, stats),
                              fingerprint, partition_by=("field", "bucket"))
        if fail_after == "postings":
            raise RuntimeError("injected failure after stage postings")

        self._write_meta({
            "last_updated": start_ms, "config_hash": self.config.config_hash(),
            "n_docs": stats.n_docs, "avgdl": stats.avgdl, "sum_ttf": stats.sum_ttf,
            "input_fingerprint": fingerprint,
        })
        return stats

    # ------------------------------ open ------------------------------------
    def load_stats(self) -> BuildStats:
        meta = self.read_meta()
        if meta.get("last_updated", INDEX_NEVER_CREATED) < 0:
            raise RuntimeError(f"index not ready: last_updated={meta.get('last_updated')}")
        return BuildStats(n_docs=int(meta["n_docs"]),
                          avgdl={k: float(v) for k, v in meta["avgdl"].items()},
                          sum_ttf={k: int(v) for k, v in meta["sum_ttf"].items()})

    def engine(self) -> SearchEngine:
        if self.status() == INDEX_INVALIDATED:
            raise RuntimeError("index invalidated by config change; rebuild required")
        stats = self.load_stats()
        return SearchEngine(self.spark, self._read_stage("postings"),
                            self._read_stage("docs"), self._read_stage("dictionary"),
                            stats, self.config)

    # --------------------------- invariants ---------------------------------
    def verify_hashsums(self, manifest: DataFrame) -> int:
        """Per-row sha256 invariant (BASELINE.json): count of mismatches
        between the indexed hashsum and an externally provided manifest
        (repo, path, hashsum). Mirrors SelectTask.computeHashSum comparison."""
        docs = self._read_stage("docs").select("repo", "path",
                                               F.col("hashsum").alias("h_idx"))
        joined = docs.join(manifest, ["repo", "path"], "full_outer")
        return joined.filter((F.col("h_idx").isNull()) | (F.col("hashsum").isNull()) |
                             (F.col("h_idx") != F.col("hashsum"))).count()
