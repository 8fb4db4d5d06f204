"""The driver-gate round-trip contract.

The driver's CORRECTNESS_r{N}.json records only the FIRST 50 entries
of queries() (r04/r05 key sets are byte-identical to positions 1-50 of
the then-current dict).  These tests pin the two defenses:

1. every queries() key round-trips through the local gate artifact
   (CORRECTNESS_local.json, written by tools/check_oracle.py) — adding
   a query without re-running the gate fails the suite;
2. keys that have never appeared in ANY driver snapshot are ordered
   inside the first-50 window so the next driver run records them.

No Spark session needed — these are pure registry/artifact checks.
"""

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIVER_WINDOW = 50


def _entry():
    import sys

    sys.path.insert(0, REPO)
    import __spark_entry__ as E

    return E


def test_oracle_keys_subset_of_queries():
    E = _entry()
    qk = list(E.queries().keys())
    ok = set(E.oracle_sql().keys())
    assert ok <= set(qk), ok - set(qk)
    # dict must not silently collapse duplicate keys
    assert len(qk) == len(set(qk))


def test_local_gate_artifact_round_trips():
    """CORRECTNESS_local.json must cover exactly the queries() key set
    and contain only green rows (exact pass or declared no_oracle)."""
    path = os.path.join(REPO, "CORRECTNESS_local.json")
    assert os.path.exists(path), (
        "run `python tools/check_oracle.py` to regenerate the local "
        "gate artifact after changing queries()"
    )
    local = json.load(open(path))
    E = _entry()
    qkeys = set(E.queries().keys())
    assert set(local.keys()) == qkeys, (
        "stale CORRECTNESS_local.json — re-run tools/check_oracle.py; "
        f"missing={sorted(qkeys - set(local.keys()))} "
        f"extra={sorted(set(local.keys()) - qkeys)}"
    )
    bad = {
        k: v
        for k, v in local.items()
        if not (v.get("hash_match") is True or v.get("err") == "no_oracle")
    }
    assert not bad, bad


def test_never_recorded_keys_sit_in_driver_window():
    """Any queries() key absent from every driver CORRECTNESS_r*.json
    must be among the first DRIVER_WINDOW entries, so the next driver
    round finally records it.  When MORE than DRIVER_WINDOW keys have
    never been recorded (the registry grew faster than the window),
    the strongest achievable invariant holds instead: every window
    slot is spent on a never-recorded key (no already-recorded key
    wastes one), and the overflow keys are green in the local gate
    artifact."""
    E = _entry()
    qkeys = list(E.queries().keys())
    recorded = set()
    for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        recorded |= set(json.load(open(p)).keys())
    never = [k for k in qkeys if k not in recorded]
    window = qkeys[:DRIVER_WINDOW]
    if len(never) <= DRIVER_WINDOW:
        out = [k for k in never if k not in set(window)]
        assert not out, (
            f"never-driver-recorded queries outside the first "
            f"{DRIVER_WINDOW} positions: {out}"
        )
    else:
        wasted = [k for k in window if k in recorded]
        assert not wasted, (
            f"window slots wasted on already-recorded keys while "
            f"{len(never) - DRIVER_WINDOW} never-recorded keys wait "
            f"outside: {wasted}"
        )
        overflow = [k for k in never if k not in set(window)]
        local = json.load(
            open(os.path.join(REPO, "CORRECTNESS_local.json"))
        )
        for k in overflow:
            v = local.get(k, {})
            assert (
                v.get("hash_match") is True or v.get("err") == "no_oracle"
            ), (k, v)
