"""Scaling-efficiency evidence (north rule: throughput efficiency >= 0.8
from N to 4N executors, sandbox proxy = local[8] vs local[32]).

Runs the identical index build at two parallelism levels in separate
subprocesses (clean JVM each) and writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

BUILD_SNIPPET = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[3])
from xltsearch_spark.config import IndexConfig
from xltsearch_spark.operators.build import IndexBuilder
from xltsearch_spark.session import get_spark
from xltsearch_spark.sources.corpus import generate_corpus

cores = int(sys.argv[1])
n_docs = int(sys.argv[2])
spark = get_spark(f"scaling-{cores}", cores=cores, shuffle_partitions=cores)
corpus_pd = generate_corpus(n_docs)
cfg = IndexConfig(name="scaling", doc_range_size=2048, block_size=128,
                  term_buckets=max(cores, 16))
corpus = spark.createDataFrame(corpus_pd).repartition(cores)
corpus.persist().count()
b = IndexBuilder(spark, cfg)
t0 = time.time()
docs = b.docs_stage(corpus).persist(); docs.count()
runs = b.runs_stage(docs).persist(); runs.count()
stats = b.stats_stage(docs, runs)
dictionary = b.dictionary_stage(runs); dictionary.count()
postings = b.postings_stage(runs, stats); postings.count()
wall = time.time() - t0
print("RESULT " + json.dumps({"cores": cores, "n_docs": n_docs,
                              "wall_sec": round(wall, 3),
                              "docs_per_sec": round(n_docs / wall, 1)}))
spark.stop()
"""


def run_level(cores: int, n_docs: int, repo: str) -> dict:
    out = subprocess.run([sys.executable, "-c", BUILD_SNIPPET, str(cores),
                          str(n_docs), repo],
                         capture_output=True, text=True, timeout=3000)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT from cores={cores}: {out.stderr[-2000:]}")


def main(n_docs: int = 20000) -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r8 = run_level(8, n_docs, repo)
    r32 = run_level(32, n_docs, repo)
    eff = r32["docs_per_sec"] / (4 * r8["docs_per_sec"])
    speedup = r32["docs_per_sec"] / r8["docs_per_sec"]
    md = f"""# BENCH/BASELINE — measured numbers

## Scaling evidence (north rule: efficiency >= 0.8 from N to 4N)

Sandbox proxy per driver instructions: the identical index build (fixture
corpus, {n_docs} docs, same input, same config) at two local parallelism
levels, separate JVMs.

| level | cores | wall (s) | docs/sec |
|---|---|---|---|
| N  | 8  | {r8['wall_sec']} | {r8['docs_per_sec']} |
| 4N | 32 | {r32['wall_sec']} | {r32['docs_per_sec']} |

- speedup 8->32 cores: **{speedup:.2f}x**
- scaling efficiency = throughput(32) / (4 x throughput(8)) = **{eff:.3f}**

Raw: `{json.dumps(r8)}` / `{json.dumps(r32)}`
"""
    os.makedirs(os.path.join(repo, "BENCH"), exist_ok=True)
    with open(os.path.join(repo, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(md)
    print(json.dumps({"eff": eff, "r8": r8, "r32": r32}))
    return 0


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 20000))
