"""Property tests for .hs round trips.

Quirk Q6 makes the format inherently aliasing: the client HLL shares the
last filter's tail page(s), and honas ORs both into one memory region.
Exact equality therefore cannot hold for fresh states in the overlap —
the correct round-trip laws are:

  1. bit-superset: imported filters contain every original bit (OR can
     only add), so probes of inserted keys still hit;
  2. counters/timestamps are exact;
  3. export∘import is a FIXED POINT: once a state has been through the
     format, further round trips are byte-exact (this is also what makes
     reference-written files round-trip exactly — they are already
     aliasing-consistent)."""

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from honas_spark.spec import SketchSpec
from honas_spark.state import SketchState
from honas_spark.sources.hsfile import export_hs_state, import_hs_state

SPEC = SketchSpec(
    m_bits=1 << 16, k=3, num_filters=3, filters_per_user=2,
    cms_width=128, kll_k=32,
)

keys_st = st.lists(st.binary(min_size=32, max_size=32), max_size=25)
clients_st = st.lists(
    st.integers(min_value=0, max_value=2**63 - 1), min_size=1, max_size=4
)


def _build(keys, clients):
    s = SketchState(SPEC)
    if keys:
        ch = np.array(
            [clients[i % len(clients)] for i in range(len(keys))],
            dtype=np.uint64,
        )
        s.update(
            pd.Series(keys), client_hashes=ch,
            ts=pd.Series(pd.to_datetime(
                [1_700_000_000 + i for i in range(len(keys))], unit="s"
            )),
        )
    return s


@settings(max_examples=20, deadline=None)
@given(keys_st, clients_st)
def test_hs_roundtrip_laws(tmp_path_factory, keys, clients):
    d = tmp_path_factory.mktemp("hs")
    a = _build(keys, clients)
    p1, p2 = str(d / "s1.hs"), str(d / "s2.hs")
    export_hs_state(a, p1)
    spec_b, b, h = import_hs_state(p1, spec=SPEC)
    assert spec_b == SPEC
    # law 1: superset bits — probes of inserted keys still hit
    for fa, fb in zip(a.filters, b.filters):
        assert np.array_equal(fa & fb, fa), "round trip lost filter bits"
    if keys:
        hits_a, _ = a.probe(keys)
        hits_b, _ = b.probe(keys)
        assert (hits_b >= hits_a).all()
    # law 2: counters/timestamps exact
    assert b.n_rows == a.n_rows
    if keys:
        assert int(b.first_ts.timestamp()) == int(a.first_ts.timestamp())
        assert int(b.last_ts.timestamp()) == int(a.last_ts.timestamp())
    # law 3: fixed point — second round trip is byte-exact
    export_hs_state(b, p2)
    _, c, _ = import_hs_state(p2, spec=SPEC)
    assert np.array_equal(b.filters, c.filters)
    assert np.array_equal(b.hll_clients, c.hll_clients)
    assert np.array_equal(b.hll_items, c.hll_items)


@settings(max_examples=15, deadline=None)
@given(keys_st, keys_st, clients_st)
def test_merge_commutes_with_hs_io(tmp_path_factory, k1, k2, clients):
    """Merging two imported states == importing the merge (both already
    aliasing-consistent -> exact)."""
    d = tmp_path_factory.mktemp("hs2")
    a, b = _build(k1, clients), _build(k2, clients)
    export_hs_state(a, str(d / "a.hs"))
    export_hs_state(b, str(d / "b.hs"))
    _, a2, _ = import_hs_state(str(d / "a.hs"), spec=SPEC)
    _, b2, _ = import_hs_state(str(d / "b.hs"), spec=SPEC)
    merged = a2.merge(b2)
    export_hs_state(merged, str(d / "m.hs"))
    _, m2, _ = import_hs_state(str(d / "m.hs"), spec=SPEC)
    assert np.array_equal(m2.filters, merged.filters)
    assert np.array_equal(m2.hll_items, merged.hll_items)
    assert m2.n_rows == a.n_rows + b.n_rows
