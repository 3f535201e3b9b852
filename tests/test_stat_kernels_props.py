"""Property tests (hypothesis) for the pure-Python skipping kernels in
operators/versioned.py — no Spark session needed, so hundreds of cases
run in milliseconds:

- bloom filters may never produce a FALSE NEGATIVE (a pruned file that
  held the value would silently drop rows), for any value set and any
  sizing;
- string-envelope truncation must emit a true lower/upper BOUND pair
  (a too-tight bound prunes a file containing matches) within the
  length cap.
"""

from __future__ import annotations

import base64

from hypothesis import given, settings
from hypothesis import strategies as st

from polygon_daily_market_data_pipeline_spark.operators.versioned import (
    _STR_STAT_MAXLEN,
    _bloom_key_bytes,
    _bloom_maybe_contains,
    _bloom_params,
    _bloom_positions,
    _truncate_str_env,
)


def _build_bloom(values, fpp=0.01):
    m, k = _bloom_params(len(values), fpp)
    bits = bytearray(m // 8)
    for v in values:
        for pos in _bloom_positions(_bloom_key_bytes(v), m, k):
            bits[pos >> 3] |= 1 << (pos & 7)
    return {"m": m, "k": k, "b64": base64.b64encode(bytes(bits)).decode()}


@settings(max_examples=200, deadline=None)
@given(
    st.sets(
        st.one_of(st.integers(), st.text(max_size=40), st.booleans()),
        min_size=1,
        max_size=200,
    )
)
def test_bloom_never_false_negative(values):
    ent = _build_bloom(values)
    for v in values:
        assert _bloom_maybe_contains(ent, v), v


@settings(max_examples=200, deadline=None)
@given(st.sets(st.integers(), min_size=1, max_size=500))
def test_bloom_fpp_reasonable_on_disjoint_ints(values):
    """Sanity, not an exact bound: values far outside the built set
    should mostly miss — catches a degenerate all-bits-set sizing."""
    ent = _build_bloom(values)
    probes = [max(values) + 10_000 + i for i in range(50)]
    hits = sum(_bloom_maybe_contains(ent, p) for p in probes)
    assert hits <= 25, hits  # honest filters score ~0–2


@settings(max_examples=500, deadline=None)
@given(st.text(max_size=300), st.text(max_size=300))
def test_truncate_str_env_is_a_true_bound(a, b):
    lo, hi = min(a, b), max(a, b)
    t = _truncate_str_env(lo, hi)
    if t is None:
        return  # allowed: no upper bound exists -> column unprunable
    lo_t, hi_t = t
    assert lo_t <= lo, (lo_t, lo)
    assert hi_t >= hi, (hi_t, hi)
    assert len(lo_t) <= _STR_STAT_MAXLEN
    assert len(hi_t) <= _STR_STAT_MAXLEN
    # every value inside the original envelope stays inside the
    # truncated one (the pruning decision can only get LOOSER)
    assert lo_t <= lo <= hi <= hi_t


@settings(max_examples=300, deadline=None)
@given(st.text(min_size=65, max_size=200))
def test_truncate_upper_bound_covers_shared_prefix_extensions(s):
    """The classic failure: hi is truncated, and a longer string
    sharing the 64-char prefix must still be <= the truncated hi."""
    t = _truncate_str_env(s[:10], s)
    if t is None:
        return
    _lo_t, hi_t = t
    assert s <= hi_t  # s itself is the hard case
    # the incremented-prefix bound even covers ARBITRARY extensions
    assert s + "\U0010ffff" <= hi_t
