"""Deterministically tile the sf0.1 tables to a larger scale factor
for full-query-set benchmarking (BENCH_sf1): every fact table is
replicated `mult` times with key offsets and a deterministic
per-replica perturbation, so the scaled corpus has `mult`x the rows
AND `mult`x the vocabulary / key space (a naive identical tile would
make every doc a 10-way exact duplicate and benchmark the dedup
operators on a pathological corpus instead of a bigger one).

  documents  doc_id += k*OFF; every token prefixed c{k}z (disjoint
             vocab per replica -> shingle/minhash work scales linearly)
  events     event_id/user_id += k*OFF; ts += k hours (more windows)
  embeddings vec_id += k*OFF; deterministic per-dim nudge (distinct
             directions per replica)
  orders     o_orderkey += k*OFF (o_custkey kept: dims not tiled)
  lineitem   l_orderkey += k*OFF

Dimension tables (region nation customer supplier part) are copied
as-is.  Usage:

  python tools/gen_sf.py [src] [dst] [mult]
  SPARK_GRAFT_SF_DIR=<dst> BENCH_CORPUS_ROWS=5000000 python bench.py
"""

from __future__ import annotations

import os
import shutil
import sys

from pyspark.sql import functions as F

OFF = 10_000_000


def tile(spark, src: str, dst: str, mult: int) -> None:
    def reps(df, fn):
        parts = [fn(df, k) for k in range(mult)]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    docs = spark.read.parquet(f"{src}/documents.parquet")

    def doc_rep(df, k):
        if k == 0:
            return df
        text = F.regexp_replace(F.col("text"), r"(\S+)", f"c{k}z$1")
        return df.select(
            (F.col("doc_id") + k * OFF).alias("doc_id"),
            text.alias("text"),
            "lang", "source",
            F.length(text).cast("long").alias("n_chars"),
        )

    reps(docs, doc_rep).repartition(32).write.mode("overwrite").parquet(
        f"{dst}/documents.parquet"
    )

    ev = spark.read.parquet(f"{src}/events.parquet")

    def ev_rep(df, k):
        if k == 0:
            return df
        return df.select(
            (F.col("event_id") + k * OFF).alias("event_id"),
            (F.col("ts") + F.expr(f"INTERVAL {k} HOURS")).alias("ts"),
            (F.col("user_id") + k * OFF).alias("user_id"),
            "event_type", "value", "props",
        )

    reps(ev, ev_rep).repartition(32).write.mode("overwrite").parquet(
        f"{dst}/events.parquet"
    )

    emb = spark.read.parquet(f"{src}/embeddings.parquet")

    def emb_rep(df, k):
        if k == 0:
            return df
        nudged = F.transform(
            F.col("embedding"),
            lambda x, i: (
                x + F.lit(0.001 * k) * ((i % 7) + 1).cast("float")
            ).cast("float"),
        )
        return df.select(
            (F.col("vec_id") + k * OFF).alias("vec_id"),
            nudged.alias("embedding"),
            "label",
        )

    reps(emb, emb_rep).repartition(8).write.mode("overwrite").parquet(
        f"{dst}/embeddings.parquet"
    )

    orders = spark.read.parquet(f"{src}/orders.parquet")

    def ord_rep(df, k):
        if k == 0:
            return df
        return df.withColumn("o_orderkey", F.col("o_orderkey") + k * OFF)

    reps(orders, ord_rep).repartition(32).write.mode(
        "overwrite"
    ).parquet(f"{dst}/orders.parquet")

    li = spark.read.parquet(f"{src}/lineitem.parquet")

    def li_rep(df, k):
        if k == 0:
            return df
        return df.withColumn("l_orderkey", F.col("l_orderkey") + k * OFF)

    reps(li, li_rep).repartition(32).write.mode("overwrite").parquet(
        f"{dst}/lineitem.parquet"
    )

    for t in ["region", "nation", "customer", "supplier", "part"]:
        s, d = f"{src}/{t}.parquet", f"{dst}/{t}.parquet"
        if os.path.isdir(s):
            shutil.copytree(s, d, dirs_exist_ok=True)
        else:
            shutil.copyfile(s, d)


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/honas_sf1"
    mult = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from honas_spark.session import get_spark

    spark = get_spark(app="gen_sf", cpus=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(dst, exist_ok=True)
    tile(spark, src, dst, mult)
    for t in ["documents", "events", "embeddings", "orders", "lineitem"]:
        n = spark.read.parquet(f"{dst}/{t}.parquet").count()
        print(f"{t}: {n} rows")
    spark.stop()


if __name__ == "__main__":
    main()
