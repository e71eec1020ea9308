"""Change detection + incremental index maintenance (SURVEY.md B2/B6/B7).

``change_diff`` re-expresses ``SelectTask.java:66-90`` — the reference's
3-way hash comparison of {files on disk} vs {indexed docs} — as one
full-outer join + a status column:

    hash differs          -> 'update'   (SELECTED docket -> updateDocument)
    not indexed yet       -> 'insert'   (SELECTED -> addDocument path)
    hash equal            -> 'unchanged'(PASS docket, IndexTask.java:85-86)
    indexed, not on disk  -> 'delete'   (DELETE docket, IndexTask.java:87-88)

The incremental apply follows Lucene's actual ``updateDocument`` semantics
(``IndexTask.java:83``: atomic delete-then-add): changed/new docs are
re-tokenized into a NEW SEGMENT with fresh doc ids appended after maxDoc;
old versions and deletions become tombstones. Collection statistics
(maxDoc, docFreq, sumTotalTermFreq) keep counting tombstoned docs until a
compaction — precisely Lucene 4.6's behavior before segment merges — and
``IndexCatalog.compact()`` is the ``forceMerge`` equivalent that restores
the canonical dense (repo, path)-ordered layout.

Scale notes: the diff is one co-partitionable join on (repo, path); only
changed rows are re-tokenized (the expensive stage); unchanged segments'
runs/postings parquet is untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

CHANGE_STATUSES = ("insert", "update", "unchanged", "delete")


def change_diff(new_corpus: DataFrame, indexed_docs: DataFrame,
                full_snapshot: bool = True) -> DataFrame:
    """Join on (repo, path) with sha256 comparison.

    ``new_corpus``: (repo, path, commit, lang, content[, title]) — hashes
    are computed here (B1). ``indexed_docs``: the current live docs table
    (repo, path, hashsum, doc_id).
    ``full_snapshot=True`` (the reference's model: the folder IS the corpus)
    uses a full-outer join so indexed docs missing from the input become
    deletes; ``False`` (streaming append batches) uses a left join — absent
    docs are simply not part of the batch.
    Returns new_corpus columns + ``old_doc_id`` + ``change_status``.
    """
    from pyspark.sql.window import Window
    # last-write-wins per key: a batch carrying two rows for one (repo, path)
    # (possible with streaming micro-batches) must index exactly one, like
    # Lucene updateDocument. Deterministic pick: max commit, then max hashsum.
    # NULL content hashes as empty — a present row is never misread as a
    # delete (the delete branch keys on the OUTER-join null, not the hash).
    staged = new_corpus.withColumn(
        "hashsum_new",
        F.sha2(F.coalesce(F.col("content"), F.lit("")).cast("binary"), 256))
    order_cols = [F.desc("hashsum_new")]
    if "commit" in new_corpus.columns:
        order_cols.insert(0, F.desc_nulls_last("commit"))
    wk = Window.partitionBy("repo", "path").orderBy(*order_cols)
    staged = (staged.withColumn("_rn", F.row_number().over(wk))
              .filter(F.col("_rn") == 1).drop("_rn"))
    idx = indexed_docs.select(
        "repo", "path", F.col("hashsum").alias("hashsum_old"),
        F.col("doc_id").alias("old_doc_id"))
    j = staged.join(idx, ["repo", "path"], "full_outer" if full_snapshot else "left")
    status = (
        F.when(F.col("hashsum_new").isNull(), F.lit("delete"))
        .when(F.col("hashsum_old").isNull(), F.lit("insert"))
        .when(F.col("hashsum_new") == F.col("hashsum_old"), F.lit("unchanged"))
        .otherwise(F.lit("update")))
    return j.withColumn("change_status", status).drop("hashsum_old")


def diff_summary(diff: DataFrame) -> dict[str, int]:
    rows = diff.groupBy("change_status").count().collect()
    out = {s: 0 for s in CHANGE_STATUSES}
    out.update({r["change_status"]: int(r["count"]) for r in rows})
    return out
