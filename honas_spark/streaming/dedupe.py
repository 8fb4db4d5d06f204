"""Stateful streaming exact-dedup: drop documents whose normalized
fingerprint has been seen in ANY earlier micro-batch.

The batch engine dedups with a groupBy (dedup_exact / near_dedup); a
stream cannot — a duplicate may arrive hours after its original, so the
seen-set must live in the state store, keyed by fingerprint.  This is
the at-ingest dedup stage of a continuously-fed training-data pipeline:
annotate (or drop) repeats as they land, emit each distinct document
exactly once with keep=1.

Semantics:
  * the FIRST row of a fingerprint (min id within its first batch)
    gets keep=1 and becomes the representative;
  * every later row of that fingerprint — same batch or any later
    micro-batch, across restarts — gets keep=0 plus the representative
    id (rep_id) for provenance;
  * state survives restarts via the streaming checkpoint (tested).

Scale shape: the stateful shuffle carries (fingerprint, id) only — the
fingerprint is computed JVM-side (md5 of the normalized text) BEFORE
the stateful operator, and the caller joins content back by id
afterwards.  State is one (rep_id) long per DISTINCT document; at
corpus scale back the state store with RocksDB
(spark.sql.streaming.stateStore.providerClass) so the seen-set pages to
disk instead of executor heap."""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from ..functions.text import fingerprint


def _deduper(id_col: str):
    def fn(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state
    ) -> Iterator[pd.DataFrame]:
        ids: list = []
        for pdf in pdfs:
            if len(pdf):
                ids.extend(int(v) for v in pdf[id_col])
        if not ids:
            return
        ids.sort()
        if state.exists:
            (rep,) = state.get
            out = [(i, key[0], 0, int(rep)) for i in ids]
        else:
            rep = ids[0]
            state.update((int(rep),))
            out = [(rep, key[0], 1, int(rep))]
            out += [(i, key[0], 0, int(rep)) for i in ids[1:]]
        yield pd.DataFrame(
            out, columns=[id_col, "fp", "keep", "rep_id"]
        )

    return fn


def dedup_stream(stream_df, id_col: str = "doc_id",
                 text_col: str = "text"):
    """stream_df (streaming DataFrame with id_col, text_col) ->
    append-mode stream of (id, fp, keep, rep_id): keep=1 exactly once
    per distinct normalized text, duplicates annotated with their
    representative."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = stream_df.select(
        id_col, fingerprint(stream_df[text_col]).alias("fp")
    )
    out_schema = f"{id_col} long, fp string, keep int, rep_id long"
    return keyed.groupBy("fp").applyInPandasWithState(
        _deduper(id_col),
        out_schema,
        "rep long",
        "append",
        GroupStateTimeout.NoTimeout,
    )
