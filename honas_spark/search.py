"""Search jobs & results — the honas-search query interface.

Job format (reference README.md:296-339):
    {"groups": [{"id": 1, "hostnames": {"<key>": "<sha256 hex>"}}]}

Result semantics (src/bin/honas_search.c:129-421):
  * per-key `hits` = number of filters probably containing the key
  * threshold (F4): keys with hits < filters_per_user are dropped from the
    per-key output (honas_search.c:199-217)
  * flatten (D1): when the sketch's estimated distinct-client count is
    below `flatten_threshold`, hit counts are clamped to 0/1
    (honas_search.c:373-381; Quirk Q2 — we follow the documented *client*
    semantics, the reference code compares the hostname estimate)
  * group AND (J3): `hits_by_all_hostnames` = popcount of the bitwise AND
    of the per-key filter-hit bitmasks across ALL keys of the group — any
    missing key zeroes it (honas_search.c:303-314)

Everything after the probe is plain DataFrame expressions."""

from __future__ import annotations

import hashlib
import json
import math
from typing import Sequence

from pyspark.sql import DataFrame, functions as F

from .spec import SketchSpec
from .operators.probe import probe_sketches


def parse_search_job(job: "dict | str") -> list[tuple]:
    """Job JSON -> [(group_id, key, sha_bytes)] (S4 source)."""
    if isinstance(job, str):
        job = json.loads(job)
    out = []
    for grp in job["groups"]:
        for key, hexsha in grp["hostnames"].items():
            out.append((int(grp["id"]), key, bytes.fromhex(hexsha)))
    return out


def make_search_job(groups: dict[int, Sequence[str]]) -> dict:
    """Build a job from plain key strings (hashing driver-side)."""
    return {
        "groups": [
            {
                "id": gid,
                "hostnames": {
                    k: hashlib.sha256(k.encode()).hexdigest() for k in keys
                },
            }
            for gid, keys in groups.items()
        ]
    }


def run_search(
    sketch_df: DataFrame,
    spec: SketchSpec,
    job: "dict | str",
    group_cols: Sequence[str],
) -> tuple[DataFrame, DataFrame]:
    """-> (per-key hits DF, per-group DF) with full honas semantics."""
    group_cols = list(group_cols)
    queries = parse_search_job(job)
    probed = probe_sketches(sketch_df, spec, queries, group_cols)

    flattened = F.col("est_clients") < F.lit(spec.flatten_threshold)
    probed = probed.withColumn("flattened", flattened).withColumn(
        "hits_out",
        F.when(flattened, F.least(F.col("hits"), F.lit(1))).otherwise(
            F.col("hits")
        ),
    )

    # group AND over ALL keys (before the per-key threshold filter)
    group_df = (
        probed.groupBy(*group_cols, "group_id")
        .agg(
            F.bit_count(
                F.bit_and(F.col("filters_hit"))
            ).alias("hits_by_all_hostnames"),
            F.max("flattened").alias("flattened"),
        )
        .withColumn(
            "hits_by_all_hostnames",
            F.when(
                F.col("flattened"),
                F.least(F.col("hits_by_all_hostnames"), F.lit(1)),
            ).otherwise(F.col("hits_by_all_hostnames")),
        )
    )

    # D5: coarse per-key client estimate from the hit count (a key seen
    # by more distinct clients lands in more of the F filters;
    # README.md:273-279) — invert E[touched] = F(1-(1-u/F)^c)
    F_, u_ = spec.num_filters, spec.filters_per_user
    base = 1.0 - u_ / F_
    # hits == F means "all filters touched" — the inversion diverges, so
    # emit null ("at least everyone", keeps the JSON standard-parseable)
    est_clients_for_hits = F.when(F.col("hits") <= 0, F.lit(0.0)).otherwise(
        F.when(F.col("hits") >= F_, F.lit(None).cast("double")).otherwise(
            F.log(1.0 - F.col("hits") / F_) / math.log(base)
            if base > 0
            else F.lit(1.0)
        )
    )

    key_df = (
        probed.filter(F.col("hits") >= F.lit(spec.filters_per_user))
        .select(
            *group_cols,
            "group_id",
            "key",
            F.col("hits_out").alias("hits"),
            "filters_hit",
            "flattened",
            F.round(est_clients_for_hits, 2).alias("est_key_clients"),
            "n_rows",
            "est_clients",
            "est_items",
            "total_bits_set",
        )
    )
    return key_df, group_df


def search_result_json(
    key_df: DataFrame, group_df: DataFrame, group_cols: Sequence[str]
) -> str:
    """S5 sink: render the search result as the reference's JSON shape."""
    keys = [r.asDict() for r in key_df.collect()]
    groups = [r.asDict() for r in group_df.collect()]
    for row in keys + groups:
        for c in list(row):
            v = row[c]
            if hasattr(v, "isoformat"):
                row[c] = v.isoformat()
    return json.dumps({"hostnames": keys, "groups": groups}, default=str)
