"""Iceberg-style table source (the north rule's input is "an Iceberg
table of source-code repositories").

The sandbox image has no Iceberg runtime jar, so this module does the
honest thing: use Iceberg when the runtime is on the classpath,
otherwise fall back to plain parquet with the same (repo, path, commit,
lang, content) schema.  On a real cluster the only difference is the
session config below plus `--packages org.apache.iceberg:...`; every
operator in this engine consumes a DataFrame and is storage-agnostic.
Checkpoint commits (sources/checkpoint.py) map onto Iceberg table
commits the same way: atomic snapshot publish replaces the tmp+rename."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ICEBERG_SESSION_CONF = {
    # documented for cluster use — harmless if the jar is absent
    "spark.sql.extensions":
        "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
    "spark.sql.catalog.corpus": "org.apache.iceberg.spark.SparkCatalog",
    "spark.sql.catalog.corpus.type": "hadoop",
}


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def read_corpus_table(
    spark: SparkSession, identifier: str, fallback_parquet: str | None = None
) -> DataFrame:
    """Read the corpus table: `identifier` is an Iceberg table name
    (catalog.db.table) when Iceberg is available, else a parquet path
    (or `fallback_parquet`)."""
    if iceberg_available(spark) and not identifier.endswith(".parquet"):
        return spark.read.format("iceberg").load(identifier)
    path = fallback_parquet or identifier
    return spark.read.parquet(path)


def write_sketch_table(
    df: DataFrame, identifier: str, mode: str = "overwrite"
) -> None:
    """Publish a sketch table: Iceberg commit when available (atomic
    snapshot), parquet directory otherwise."""
    spark = df.sparkSession
    if iceberg_available(spark) and not identifier.endswith(".parquet"):
        df.writeTo(identifier).createOrReplace()
    else:
        df.write.mode(mode).parquet(identifier)
