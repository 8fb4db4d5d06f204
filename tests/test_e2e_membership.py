"""End-to-end membership scenario — the port of the reference's
tests/state_aggregation.c:64-221 onto the code corpus analog:

two windows with (mostly) disjoint key sets -> build sketch per window ->
probe (member found in its window, absent elsewhere), entity@ variants,
PTR-mode rows store no labels, never-inserted key absent everywhere,
merge of windows contains the union, exact bitset equality under merge
orderings."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from honas_spark.spec import SketchSpec
from honas_spark.state import SketchState
from honas_spark.functions.text import explode_keys
from honas_spark.operators import build_sketches, sha256_key, rollup_sketches
from honas_spark.search import make_search_job, run_search

SPEC = SketchSpec(
    m_bits=1 << 20, k=10, num_filters=4, filters_per_user=2,
    window="1 hour", cms_width=1024, kll_k=64,
)


@pytest.fixture(scope="module")
def sketch_table(spark):
    rows = [
        # window A (00:xx)
        ("org0/repo0", "src/alpha/bravo/main.py", "py", "2024-01-01 00:10:00", False),
        ("org0/repo0", "src/alpha/util.py", "py", "2024-01-01 00:20:00", False),
        ("org1/repo1", "lib/charlie/delta.rs", "rs", "2024-01-01 00:30:00", False),
        ("org1/repo1", "ptronly/hidden/label.go", "go", "2024-01-01 00:40:00", True),
        # window B (01:xx)
        ("org0/repo0", "src/echo/foxtrot/mod.rs", "rs", "2024-01-01 01:10:00", False),
        ("org2/repo2", "docs/golf/readme.txt", "txt", "2024-01-01 01:20:00", False),
    ]
    df = spark.createDataFrame(
        rows, "repo string, path string, lang string, ts_s string, ptr_mode boolean"
    ).withColumn("commit_ts", F.to_timestamp("ts_s"))
    keyed = explode_keys(df, "path", entity_col="lang", ptr_col="ptr_mode")
    keyed = sha256_key(keyed, "key")
    keyed = keyed.withColumn(
        "window_start", F.window("commit_ts", SPEC.window)["start"]
    )
    sk = build_sketches(
        keyed, SPEC, group_cols=["window_start"], client_col="repo",
        ts_col="commit_ts",
    ).cache()
    assert sk.count() == 2
    return sk


def _hits(key_df, key, window_hour):
    rows = [
        r
        for r in key_df.collect()
        if r["key"] == key and r["window_start"].hour == window_hour
    ]
    return rows[0]["hits"] if rows else 0


def test_membership_per_window_and_entity_variants(spark, sketch_table):
    job = make_search_job({
        1: ["src/alpha/bravo/main.py"],      # full name, window A
        2: ["py@src/alpha/bravo/main.py"],   # entity@full (P3)
        3: ["alpha"],                        # non-TLD label
        4: ["bravo/main.py"],                # SLD.TLD analog
        5: ["src/echo/foxtrot/mod.rs"],      # window B full name
        6: ["never/inserted/key.zz"],        # non-member
    })
    key_df, _ = run_search(sketch_table, SPEC, job, ["window_start"])
    kdf = key_df.cache()
    u = SPEC.filters_per_user
    assert _hits(kdf, "src/alpha/bravo/main.py", 0) >= u
    assert _hits(kdf, "src/alpha/bravo/main.py", 1) == 0
    assert _hits(kdf, "py@src/alpha/bravo/main.py", 0) >= u
    assert _hits(kdf, "alpha", 0) >= u
    assert _hits(kdf, "bravo/main.py", 0) >= u
    assert _hits(kdf, "src/echo/foxtrot/mod.rs", 1) >= u
    assert _hits(kdf, "src/echo/foxtrot/mod.rs", 0) == 0
    assert _hits(kdf, "never/inserted/key.zz", 0) == 0
    assert _hits(kdf, "never/inserted/key.zz", 1) == 0


def test_ptr_mode_stores_only_full_name(spark, sketch_table):
    """Quirk Q3 (honas_state.c:359): PTR rows register the full name (and
    entity variant) but none of the labels / SLD."""
    job = make_search_job({
        1: ["ptronly/hidden/label.go"],
        2: ["go@ptronly/hidden/label.go"],
        3: ["ptronly"],            # label: must NOT be stored
        4: ["hidden"],             # label: must NOT be stored
        5: ["hidden/label.go"],    # SLD analog: must NOT be stored
    })
    key_df, _ = run_search(sketch_table, SPEC, job, ["window_start"])
    kdf = key_df.cache()
    assert _hits(kdf, "ptronly/hidden/label.go", 0) >= SPEC.filters_per_user
    assert _hits(kdf, "go@ptronly/hidden/label.go", 0) >= SPEC.filters_per_user
    assert _hits(kdf, "ptronly", 0) == 0
    assert _hits(kdf, "hidden", 0) == 0
    assert _hits(kdf, "hidden/label.go", 0) == 0


def test_merge_contains_union_and_is_order_invariant(spark, sketch_table):
    rows = sketch_table.collect()
    states = [SketchState.from_fields(SPEC, r.asDict()) for r in rows]
    a, b = states
    ab, ba = a.merge(b), b.merge(a)
    aba = ab.merge(a)  # idempotence
    assert np.array_equal(ab.filters, ba.filters)
    assert np.array_equal(ab.filters, aba.filters)
    assert np.array_equal(ab.hll_items, ba.hll_items)

    def sha(s):
        return hashlib.sha256(s.encode()).digest()

    # union contains members of both windows; non-member still absent
    hits_a, _ = ab.probe([sha("src/alpha/bravo/main.py")])
    hits_b, _ = ab.probe([sha("src/echo/foxtrot/mod.rs")])
    hits_n, _ = ab.probe([sha("never/inserted/key.zz")])
    assert hits_a[0] >= SPEC.filters_per_user
    assert hits_b[0] >= SPEC.filters_per_user
    assert hits_n[0] == 0
    # merged counters: requests add, estimates cover the union
    assert ab.n_rows == a.n_rows + b.n_rows


def test_rollup_equals_pairwise_merge(spark, sketch_table):
    daily = rollup_sketches(
        sketch_table, SPEC, "window_start", "1 day", []
    ).collect()
    assert len(daily) == 1
    rows = sketch_table.collect()
    a, b = [SketchState.from_fields(SPEC, r.asDict()) for r in rows]
    expected = a.merge(b)
    got = SketchState.from_fields(SPEC, daily[0].asDict())
    assert np.array_equal(got.filters, expected.filters)
    assert np.array_equal(got.hll_items, expected.hll_items)
    assert got.n_rows == expected.n_rows


def test_group_and_semantics(spark, sketch_table):
    """J3: hits_by_all_hostnames = popcount of AND of filter-hit masks;
    any missing key zeroes the group; groups where NO key hit at all are
    omitted from the result entirely (honas_search.c:303-314)."""
    job = make_search_job({
        7: ["src/alpha/bravo/main.py", "src/alpha/util.py"],   # both in A
        8: ["src/alpha/bravo/main.py", "never/inserted/key.zz"],  # one miss
    })
    _, group_df = run_search(sketch_table, SPEC, job, ["window_start"])
    rows = {
        (r["group_id"], r["window_start"].hour): r["hits_by_all_hostnames"]
        for r in group_df.collect()
    }
    assert rows[(7, 0)] > 0
    # one key missing -> group still emitted (the other key hit) but the
    # AND is zeroed (group_all_host_names_found=false)
    assert rows[(8, 0)] == 0
    # window 1 contains neither key -> zero-hit group row is OMITTED
    assert (7, 1) not in rows
    assert (8, 1) not in rows


def test_multilevel_rollup_associative(spark, sketch_table):
    """hour -> day -> week must equal hour -> week (merge associativity
    across rollup LEVELS, not just orderings)."""
    daily = rollup_sketches(sketch_table, SPEC, "window_start", "1 day", [])
    weekly_via_daily = rollup_sketches(
        daily, SPEC, "window_start", "7 days", []
    ).collect()
    weekly_direct = rollup_sketches(
        sketch_table, SPEC, "window_start", "7 days", []
    ).collect()
    assert len(weekly_via_daily) == len(weekly_direct) == 1
    a, b = weekly_via_daily[0], weekly_direct[0]
    assert a["filters"] == b["filters"]
    assert a["hll_items"] == b["hll_items"]
    assert a["n_rows"] == b["n_rows"]
