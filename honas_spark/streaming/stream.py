"""Structured Streaming ingestion — the honas-gather daemon re-expressed.

honas-gather is a socket-fed streaming aggregator with period rotation
(src/bin/honas_gather.c event loop + recheck_handler:1302-1351).  The
Spark-native equivalent: `readStream` over the landing zone ->
`foreachBatch` building per-window partial sketches for each micro-batch
-> merge into the persistent sketch store.

The merge algebra does the heavy lifting for exactly-once semantics: the
Bloom/HLL components are idempotent under re-delivery (a replayed batch
ORs in bits already set), so the store converges even across restarts;
the additive counters (n_rows, CMS) rely on the streaming checkpoint for
effectively-once, same as any counting sink.  Late/out-of-order data is
handled *better* than the reference (which stamps with now() — Quirk W3):
rows land in the window of their event time, and a re-merge is a no-op."""

from __future__ import annotations

import os
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..spec import SketchSpec
from ..operators.sketch_agg import build_sketches, rollup_sketches


class StreamingSketchBuilder:
    """foreachBatch sink: accumulates a sketch table at `store_dir`."""

    def __init__(
        self,
        spec: SketchSpec,
        store_dir: str,
        group_cols: Sequence[str],
        key_sha_col: str = "key_sha",
        client_col: Optional[str] = None,
        ts_col: Optional[str] = None,
        window_col: str = "window_start",
    ):
        self.spec = spec
        self.store_dir = store_dir
        self.group_cols = list(group_cols)
        self.key_sha_col = key_sha_col
        self.client_col = client_col
        self.ts_col = ts_col
        self.window_col = window_col

    def _store_path(self) -> str:
        return os.path.join(self.store_dir, "sketches")

    def read_store(self, spark: SparkSession) -> Optional[DataFrame]:
        path = self._store_path()
        try:
            return spark.read.parquet(path)
        except Exception:
            return None

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        batch_sketches = build_sketches(
            batch_df,
            self.spec,
            group_cols=[self.window_col] + self.group_cols,
            key_sha_col=self.key_sha_col,
            client_col=self.client_col,
            ts_col=self.ts_col,
        )
        existing = self.read_store(spark)
        if existing is not None:
            merged = rollup_sketches(
                existing.unionByName(batch_sketches),
                self.spec,
                self.window_col,
                self.spec.window,
                self.group_cols,
            )
        else:
            merged = batch_sketches
        tmp = self._store_path() + f".tmp-{epoch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        final = self._store_path()
        # atomic swap (read-modify-write per micro-batch; at 100 TB you'd
        # partition the store by window and only rewrite touched windows)
        import shutil

        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)

    def start(
        self,
        stream_df: DataFrame,
        checkpoint_dir: Optional[str] = None,
        trigger_once: bool = True,
    ):
        writer = stream_df.writeStream.foreachBatch(self.process_batch)
        if checkpoint_dir:
            writer = writer.option("checkpointLocation", checkpoint_dir)
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()
