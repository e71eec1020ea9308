"""Cluster entry point for ``spark-submit --py-files`` (the north rule's
deployment shape).

Packaging (one command, no build system needed):

    cd /root/repo && zip -r /tmp/xltsearch_spark.zip xltsearch_spark

Cluster run (the session comes from spark-submit's conf, NOT from
session.get_spark — master/executors/memory belong to the submit line):

    spark-submit \\
        --master yarn --deploy-mode cluster \\
        --num-executors 1000 --executor-cores 8 --executor-memory 24g \\
        --conf spark.sql.adaptive.enabled=true \\
        --conf spark.sql.adaptive.skewJoin.enabled=true \\
        --conf spark.sql.shuffle.partitions=8000 \\
        --py-files /tmp/xltsearch_spark.zip \\
        scripts/submit_job.py build --corpus /data/corpus --warehouse /data/idx

    spark-submit ... scripts/submit_job.py search --warehouse /data/idx \\
        --query 'merge AND vector' --k 20

Sandbox smoke (same file, local master injected):

    python scripts/submit_job.py build --corpus /root/testdata/sf0.001 \\
        --warehouse /tmp/xlt_submit --local 8

Subcommands
    build   corpus dir (parquet, documents schema or canonical corpus
            schema) -> full index build through IndexCatalog.build
    update  incremental upsert/delete batch through IndexCatalog.update
    search  classic-QP query -> top-k printed as JSON lines
    bench   N repeated searches (scheduler-amortized), prints timings
    curate  documents parquet dir -> curation verdicts + funnel report
            (quality/lang gates, exact dedup, optional --benchmark
            decontamination, deterministic split; writes verdict parquet
            to --out and prints the reason/split funnel)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# on a cluster --py-files provides the package; for direct / --local runs
# fall back to the repo root next to this script
try:
    import xltsearch_spark  # noqa: F401
except ModuleNotFoundError:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def _session(args) -> SparkSession:
    b = SparkSession.builder.appName(f"xltsearch-{args.cmd}")
    if args.local:
        b = (b.master(f"local[{args.local}]")
             .config("spark.sql.shuffle.partitions", str(max(args.local, 8)))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false"))
    # under spark-submit, master/conf come from the submit line
    return b.getOrCreate()


def _load_corpus(spark: SparkSession, path: str):
    import os
    from xltsearch_spark.sources.corpus import read_corpus
    if os.path.exists(f"{path}/documents.parquet"):
        # testdata `documents` schema -> canonical corpus schema
        df = spark.read.parquet(f"{path}/documents.parquet")
        return df.select(
            F.col("source").alias("repo"),
            F.lpad(F.col("doc_id").cast("string"), 10, "0").alias("path"),
            F.sha2(F.col("doc_id").cast("string").cast("binary"), 256).alias("commit"),
            F.col("lang"), F.col("text").alias("content"),
            F.lit(None).cast("string").alias("title"))
    return read_corpus(spark, path)


def _cmd_curate(args):
    """Curation is index-free: corpus in, verdicts + funnel out."""
    from xltsearch_spark.operators.curation import curate, curation_report
    if not args.corpus:
        raise SystemExit("--corpus is required for curate")
    spark = _session(args)
    docs = spark.read.parquet(f"{args.corpus}/documents.parquet"
                              if os.path.exists(f"{args.corpus}/documents.parquet")
                              else args.corpus)
    bench = (spark.read.parquet(args.benchmark)
             if args.benchmark else None)
    t0 = time.time()
    verdicts = curate(docs, bench)
    if args.out:
        verdicts.write.mode("overwrite").parquet(args.out)
        verdicts = spark.read.parquet(args.out)
    for r in curation_report(verdicts).collect():
        print(json.dumps({"reason": r["reason"], "split": r["split"],
                          "n_docs": r["n_docs"]}))
    print(json.dumps({"cmd": "curate",
                      "docs": docs.count(),
                      "wall_sec": round(time.time() - t0, 3)}))
    spark.stop()


def main(argv=None):
    ap = argparse.ArgumentParser(prog="submit_job")
    ap.add_argument("cmd", choices=["build", "update", "search", "bench",
                                    "curate"])
    ap.add_argument("--corpus", help="corpus parquet dir (build/update)")
    ap.add_argument("--warehouse", help="index warehouse dir "
                    "(required for all index commands)")
    ap.add_argument("--index", default="default")
    ap.add_argument("--query", default="merge")
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--fingerprint", default="v1")
    ap.add_argument("--analyzer", default="standard")
    ap.add_argument("--local", type=int, default=0,
                    help="run on local[N] instead of the submit-line master")
    ap.add_argument("--benchmark", help="eval-set parquet dir for "
                    "decontamination (curate)")
    ap.add_argument("--out", help="verdict parquet output dir (curate)")
    args = ap.parse_args(argv)

    if args.cmd == "curate":
        return _cmd_curate(args)
    if not args.warehouse:
        ap.error(f"--warehouse is required for {args.cmd}")

    from xltsearch_spark.catalog import IndexCatalog
    from xltsearch_spark.config import IndexConfig

    spark = _session(args)
    cfg = IndexConfig(name=args.index, analyzer=args.analyzer)
    cat = IndexCatalog(spark, args.warehouse, cfg)

    t0 = time.time()
    if args.cmd in ("build", "update"):
        if not args.corpus:
            ap.error(f"--corpus is required for {args.cmd}")
        corpus = _load_corpus(spark, args.corpus)
        if args.cmd == "build":
            cat.build(corpus, fingerprint=args.fingerprint)
        else:
            cat.update(corpus, fingerprint=args.fingerprint)
        n = cat.engine().docs.count()
        print(json.dumps({"cmd": args.cmd, "docs": n,
                          "wall_sec": round(time.time() - t0, 3)}))
    elif args.cmd == "search":
        eng = cat.engine()
        rows = eng.search(args.query, args.k).collect()
        for r in rows:
            print(json.dumps({k: r[k] for k in ("doc_id", "score", "path")
                              if k in r.asDict()}, default=str))
        print(json.dumps({"cmd": "search", "hits": len(rows),
                          "wall_sec": round(time.time() - t0, 3)}))
    else:  # bench
        eng = cat.engine()
        times = []
        for _ in range(args.repeat):
            t = time.time()
            eng.search(args.query, args.k).collect()
            times.append(time.time() - t)
        print(json.dumps({"cmd": "bench", "query": args.query,
                          "runs": [round(t, 3) for t in times],
                          "best_sec": round(min(times), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
