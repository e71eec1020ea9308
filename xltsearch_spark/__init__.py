"""xltsearch_spark — a PySpark-native inverted-index / BM25 full-text engine.

A from-scratch rebuild of the capabilities of alvanson/xltsearch (a JavaFX
desktop app wiring Apache Lucene 4.6: see /root/reference, e.g.
``IndexTask.java:54-88``, ``SearchTask.java:49-100``) re-expressed Spark-first:

* the corpus is a DataFrame/table of source files ``(repo, path, commit,
  lang, content)`` — one row = one Lucene document (``IndexTask.java:66-82``);
* index build is a SPIMI-style partition-local posting construction
  (``mapInPandas``) merged by doc-range so hot terms never concentrate on a
  single reducer, persisted as term-bucketed parquet (Iceberg-shaped layout);
* queries go through a classic Lucene QueryParser grammar
  (``SearchTask.java:59-61``) compiled to DataFrame plans, scored with
  BM25 (k1=1.2, b=0.75, Lucene-4.6 8-bit norm quantization) or classic
  TF-IDF ``DefaultSimilarity`` (``Config.java:80-84``), top-k collected with
  ``orderBy(score desc, doc_id asc).limit(k)`` (``SearchTask.java:63``).

Everything here derives from public knowledge only: the PySpark API and the
published Lucene 4.6 semantics that the (Apache-2.0) reference app selects.
"""

__version__ = "0.1.0"

from xltsearch_spark.config import IndexConfig  # noqa: F401
