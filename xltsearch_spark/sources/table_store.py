"""Persisted-table adapter — the seam SCALE.md's Iceberg mapping plugs into.

``IndexCatalog`` performs EVERY stage-table read/write through a
``TableStore``, so the storage backend is swappable without touching
catalog logic (build/resume/update/merge). SCALE.md ("Iceberg mapping")
documents the 1:1 design — postings partitioned by (field, bucket) =
Iceberg's ``bucket(term)`` transform, tombstone batches = equality-delete
merge-on-read, ``merge()`` = ``rewrite_data_files``, the meta JSON =
snapshot properties; this module makes that mapping a code seam instead of
a paper one.

Two implementations:

* ``ParquetFilesystemStore`` (default) — plain directory-partitioned
  parquet under the warehouse path, byte-identical to the catalog's
  historical inline behavior. What the sandbox runs.
* ``IcebergTableStore`` — routes the same operations through a configured
  Spark SQL catalog backed by the Iceberg runtime (``writeTo(...)``
  V2 writes, identifier-addressed reads). The Iceberg runtime jars are not
  present in this sandbox, so constructing it against an unconfigured
  session raises with setup guidance rather than failing deep inside a
  write; the class documents exactly what a real deployment provides:

      spark.sql.extensions = org.apache.iceberg.spark.extensions
                             .IcebergSparkSessionExtensions
      spark.sql.catalog.<name> = org.apache.iceberg.spark.SparkCatalog
      spark.sql.catalog.<name>.warehouse = <path>

Single-writer note (unchanged by the seam): the catalog's meta JSON is the
commit point, so concurrent writers to ONE index still need external
coordination; an Iceberg catalog would replace that file with its own
atomic snapshot commit, which is precisely what this seam isolates.
"""

from __future__ import annotations

import abc
import re

from pyspark.sql import DataFrame, SparkSession


class TableStore(abc.ABC):
    """Storage backend for the catalog's stage tables.

    ``target`` is the catalog-chosen stable identifier for a table — the
    filesystem path under the warehouse root. Implementations may use it
    directly (filesystem) or map it to their own identifier space
    (Iceberg table names)."""

    @abc.abstractmethod
    def write(self, df: DataFrame, target: str,
              partition_by: tuple[str, ...] = (),
              mode: str = "overwrite") -> None: ...

    @abc.abstractmethod
    def read(self, spark: SparkSession, target: str) -> DataFrame: ...


class ParquetFilesystemStore(TableStore):
    """Directory-partitioned parquet under the warehouse path (default)."""

    def write(self, df: DataFrame, target: str,
              partition_by: tuple[str, ...] = (),
              mode: str = "overwrite") -> None:
        writer = df.write.mode(mode)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(target)

    def read(self, spark: SparkSession, target: str) -> DataFrame:
        return spark.read.parquet(target)


class IcebergTableStore(TableStore):
    """Stage tables as Iceberg tables in a configured Spark SQL catalog.

    Identifier mapping: the catalog's filesystem-style target path becomes
    ``<catalog>.<namespace>.<slug>`` where the slug is the path with every
    non-word run collapsed to ``_`` (stable and reversible enough for
    segment/stage names, which are already ``[a-z0-9_]``)."""

    def __init__(self, spark: SparkSession, catalog: str,
                 namespace: str = "xltsearch"):
        impl = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
        if impl is None:
            raise RuntimeError(
                f"Spark SQL catalog {catalog!r} is not configured; an "
                f"IcebergTableStore needs the Iceberg runtime on the "
                f"classpath and spark.sql.catalog.{catalog} set to "
                f"org.apache.iceberg.spark.SparkCatalog (see module "
                f"docstring for the full config)")
        self.catalog = catalog
        self.namespace = namespace

    def _ident(self, target: str) -> str:
        slug = re.sub(r"\W+", "_", target).strip("_")
        return f"{self.catalog}.{self.namespace}.{slug}"

    def write(self, df: DataFrame, target: str,
              partition_by: tuple[str, ...] = (),
              mode: str = "overwrite") -> None:
        from pyspark.sql import functions as F
        writer = df.writeTo(self._ident(target)).using("iceberg")
        if partition_by:
            writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
        if mode == "overwrite":
            writer.createOrReplace()
        else:  # append (tombstone batches)
            writer.append()

    def read(self, spark: SparkSession, target: str) -> DataFrame:
        return spark.read.table(self._ident(target))
