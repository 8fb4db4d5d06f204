"""Integration: the reference's subnet-activity dataflow end-to-end
(src/subnet_activity.c + honas_gather.c): client address -> longest
matching CIDR prefix -> entity; entity@name keys enter the sketch; the
instrumentation counters report in/not-in-category; search finds the
entity-scoped key."""

import hashlib

from pyspark.sql import functions as F

from honas_spark.spec import SketchSpec
from honas_spark.functions.inet import ip4_aton
from honas_spark.functions.text import explode_keys
from honas_spark.instrumentation import instrument_run
from honas_spark.operators import build_sketches, sha256_key, with_window
from honas_spark.operators.prefix_join import cidr_longest_prefix_join
from honas_spark.search import make_search_job, run_search

CIDRS = [
    ("10.0.0.0/8", "acme"),
    ("10.64.0.0/10", "acme-west"),
    ("192.168.0.0/16", "homelab"),
]

SPEC = SketchSpec(
    m_bits=1 << 16, k=5, window="1 hour", cms_width=256, kll_k=64
)


def _traffic(spark):
    rows = [
        # (client_ip, name, ts)               -> expected entity
        ("10.1.2.3", "src/app/main.py", "2024-01-01 00:10:00"),   # acme
        ("10.65.0.9", "src/app/main.py", "2024-01-01 00:20:00"),  # acme-west
        ("192.168.1.5", "docs/readme.md", "2024-01-01 00:30:00"), # homelab
        ("8.8.8.8", "src/app/main.py", "2024-01-01 00:40:00"),    # none
    ]
    return spark.createDataFrame(
        rows, "client string, name string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))


def test_subnet_entity_flow_end_to_end(spark):
    df = _traffic(spark).withColumn("ip_num", ip4_aton(F.col("client")))
    df = cidr_longest_prefix_join(df, "ip_num", CIDRS, out_col="entity")

    got = {r["client"]: r["entity"] for r in df.collect()}
    assert got == {
        "10.1.2.3": "acme",
        "10.65.0.9": "acme-west",
        "192.168.1.5": "homelab",
        "8.8.8.8": None,
    }

    # instrumentation category = matched a subnet (n_qcat/n_qncat)
    m = instrument_run(df, category=F.col("entity").isNotNull())
    assert m["n_queries_in_category"] == 3
    assert m["n_queries_not_in_category"] == 1

    # unmatched clients keep plain keys (reference: no entity prefix)
    keyed = explode_keys(df, "name", entity_col="entity")
    keyed = sha256_key(keyed, "key")
    keyed = with_window(keyed, "ts", SPEC.window)
    sk = build_sketches(
        keyed, SPEC, group_cols=["window_start"],
        client_col="client", ts_col="ts",
    )

    job = make_search_job({
        1: ["acme-west@src/app/main.py"],   # entity-scoped key
        2: ["homelab@src/app/main.py"],     # wrong entity -> no hit
        3: ["src/app/main.py"],             # plain key (everyone)
    })
    key_df, group_df = run_search(sk, SPEC, job, ["window_start"])
    hits = {r["group_id"]: r["hits"] for r in key_df.collect()}
    assert hits.get(1) == 1
    assert 2 not in hits
    assert hits.get(3) == 1
    # zero-hit group 2 is omitted from group results too
    assert {r["group_id"] for r in group_df.collect()} == {1, 3}
