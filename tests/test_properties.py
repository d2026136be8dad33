"""Hypothesis property tests over the pure (no-Ray) kernels — the invariants
every distributed stage relies on.  Mirrors the reference's unit-fixture
strategy (SURVEY.md §5) but with generated inputs: window assignment laws,
session-boundary laws, pair-generation equivalence vs brute force, popcount
parity."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from core_ray.functions.dedup import _pairs_within_groups, popcount64
from core_ray.windows import session_ids, sliding_window_starts, tumbling_window_start

US = 1_000_000
_ts_list = st.lists(
    st.integers(min_value=0, max_value=10_000 * US), min_size=0, max_size=60
)


@settings(max_examples=60, deadline=None)
@given(
    ts=_ts_list,
    start=st.integers(min_value=0, max_value=100 * US),
    interval=st.integers(min_value=1, max_value=500 * US),
)
def test_tumbling_window_contains_its_timestamps(ts, start, interval):
    arr = np.array(ts, dtype=np.int64)
    ws = tumbling_window_start(arr, start, interval)
    # every ts falls inside [ws, ws+interval) and ws is start-aligned
    assert ((ws <= arr) & (arr < ws + interval)).all()
    assert (((ws - start) % interval) == 0).all()


@settings(max_examples=60, deadline=None)
@given(
    ts=_ts_list,
    start=st.integers(min_value=0, max_value=100 * US),
    slide=st.integers(min_value=1, max_value=200 * US),
    extra=st.integers(min_value=0, max_value=400 * US),
)
def test_sliding_windows_exactly_cover(ts, start, slide, extra):
    size = slide + extra  # size >= slide
    arr = np.array(ts, dtype=np.int64)
    idx, ws = sliding_window_starts(arr, start, size, slide)
    # each emitted (row, window) pair really contains the row
    assert ((ws <= arr[idx]) & (arr[idx] < ws + size)).all()
    assert (((ws - start) % slide) == 0).all()
    # and the multiplicity per row equals the true count of covering windows
    for i, t in enumerate(arr):
        lo = start + ((t - start) // slide) * slide  # last window start <= t
        n_true = 0
        w = lo
        while w > t - size:
            n_true += 1
            w -= slide
        assert int((idx == i).sum()) == n_true


@settings(max_examples=60, deadline=None)
@given(ts=_ts_list, gap=st.integers(min_value=1, max_value=500 * US))
def test_session_ids_split_exactly_on_gap(ts, gap):
    arr = np.sort(np.array(ts, dtype=np.int64))
    sid = session_ids(arr, gap)
    if len(arr) == 0:
        assert len(sid) == 0
        return
    assert sid[0] == 0
    d = np.diff(arr)
    # session increments exactly where the gap is exceeded
    assert (np.diff(sid) == (d > gap).astype(np.int64)).all()


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=50))
def test_popcount64_matches_python_bin(vals):
    arr = np.array(vals, dtype=np.uint64)
    got = popcount64(arr)
    assert [int(x) for x in got] == [bin(v).count("1") for v in vals]


@settings(max_examples=60, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),  # group key
            st.integers(min_value=0, max_value=30),  # doc id
            st.integers(min_value=1, max_value=9),  # carried value
        ),
        max_size=40,
    ),
    max_group=st.one_of(st.none(), st.integers(min_value=1, max_value=6)),
)
def test_pairs_within_groups_matches_bruteforce(rows, max_group):
    import itertools

    import pandas as pd

    # doc ids unique per group (the callers' invariant)
    seen, clean = set(), []
    for k, d, v in rows:
        if (k, d) not in seen:
            seen.add((k, d))
            clean.append((k, d, v))
    df = pd.DataFrame(clean, columns=["key", "doc_id", "val"])
    got = _pairs_within_groups(df, ["key"], ["val"], max_group)
    got_rows = sorted(
        zip(got["doc_a"], got["doc_b"], got["val_a"], got["val_b"])
    )
    # MULTISET comparison: a pair sharing k keys must appear k times — that
    # row multiplicity IS the co-occurrence count jaccard_pairs aggregates
    # into the intersection size (one row per shared shingle group)
    want = []
    for k, g in df.groupby("key"):
        if max_group is not None and len(g) > max_group:
            continue
        members = sorted(zip(g["doc_id"], g["val"]))
        for (a, va), (b, vb) in itertools.combinations(members, 2):
            want.append((a, b, va, vb))
    assert got_rows == sorted(want)


@settings(max_examples=80, deadline=None)
@given(
    val=st.one_of(
        st.none(),
        st.booleans(),
        st.integers(min_value=-(2**62), max_value=2**62),
        st.floats(allow_nan=False, allow_infinity=False),
        st.text(max_size=300),
        st.binary(max_size=300),
    )
)
def test_amqp_roundtrip_any_primitive(val):
    from core_ray.sources.bus import encode_amqp_value
    from core_ray.stages.binary_sources import decode_amqp_value

    rest, out = decode_amqp_value(encode_amqp_value(val))
    assert rest == b""
    assert out == val and type(out) is type(val)


@settings(max_examples=60, deadline=None)
@given(
    start_day=st.integers(min_value=0, max_value=3000),
    span=st.integers(min_value=0, max_value=400),
    chunk=st.integers(min_value=1, max_value=60),
)
def test_chunked_date_ranges_partition_exactly(start_day, span, chunk):
    import pandas as pd

    from core_ray.sources.iso import chunked_date_ranges

    s = pd.Timestamp("2000-01-01") + pd.Timedelta(days=start_day)
    e = s + pd.Timedelta(days=span)
    ranges = chunked_date_ranges(s, e, days=chunk)
    # contiguous, non-overlapping, covering [s, e+1d) exactly
    assert ranges[0][0] == s
    assert ranges[-1][1] == e + pd.Timedelta(days=1)
    for (a0, a1), (b0, b1) in zip(ranges, ranges[1:]):
        assert a1 == b0
    assert all(a < b for a, b in ranges)


@settings(max_examples=40, deadline=None)
@given(
    vals=st.lists(
        st.integers(min_value=-10_000, max_value=10_000), min_size=3, max_size=40
    ),
    step=st.integers(min_value=1, max_value=50),
)
def test_exact_ols_matches_lstsq(vals, step):
    # the exact-integer closed form and numpy lstsq agree on the same points
    n = len(vals)
    x = np.arange(n, dtype=np.int64) * step
    vc = np.array(vals, dtype=np.int64)
    Sx, Sv = int(x.sum()), int(vc.sum())
    Sxx = sum(int(a) * int(a) for a in x)
    Sxv = sum(int(a) * int(b) for a, b in zip(x, vc))
    den = n * Sxx - Sx * Sx
    if den == 0:
        return
    a = (Sv * Sxx - Sx * Sxv) / den
    b = (n * Sxv - Sx * Sv) / den
    A = np.stack([np.ones(n), x.astype(np.float64)], axis=1)
    coef, *_ = np.linalg.lstsq(A, vc.astype(np.float64), rcond=None)
    assert np.isclose(a, coef[0], rtol=1e-6, atol=1e-6)
    assert np.isclose(b, coef[1], rtol=1e-6, atol=1e-6)


@settings(max_examples=60, deadline=None)
@given(
    rows=st.lists(
        st.lists(st.integers(min_value=0, max_value=50_256),
                 min_size=0, max_size=40),
        min_size=0, max_size=8,
    ),
    w=st.integers(min_value=1, max_value=12),
    stride=st.integers(min_value=1, max_value=8),
)
def test_poly_window_hashes_match_bigint_reference(rows, w, stride):
    """The uint64-wraparound window hash equals the arbitrary-precision
    sum-mod-2^64 (what the SQL oracle's HUGEINT arithmetic computes), and
    the emitted (row, window) pairs are exactly the stride grid."""
    from core_ray.functions.training import poly_window_hashes

    vals = np.array([t for r in rows for t in r], dtype=np.int64)
    off = np.zeros(len(rows) + 1, dtype=np.int64)
    off[1:] = np.cumsum([len(r) for r in rows])
    row_idx, h = poly_window_hashes(vals, off, w, stride)

    P, M = 1_000_003, 1 << 64
    exp = []
    for ri, r in enumerate(rows):
        for s in range(0, len(r) - w + 1, stride):
            exp.append((ri, sum(r[s + k] * pow(P, w - 1 - k, M)
                                for k in range(w)) % M))
    assert list(zip(row_idx.tolist(), [int(x) for x in h])) == exp


def test_driver_materialization_sites_are_annotated():
    """Grep-gate: every ``take_all()`` / ``.to_pandas()`` in ``core_ray/``
    must carry a ``# bounded:`` (driver-side, provably small) or
    ``# per-batch`` (inside a map_batches/map_groups fn, not a driver
    collect) annotation on the line or an adjacent line.  New index layouts
    and operators keep the no-unbounded-driver-materialization invariant
    auditable instead of re-discovering it each review."""
    import pathlib

    root = pathlib.Path(__file__).resolve().parent.parent / "core_ray"
    offenders = []
    for path in sorted(root.rglob("*.py")):
        lines = path.read_text().splitlines()
        for i, line in enumerate(lines):
            if "take_all()" not in line and ".to_pandas()" not in line:
                continue
            if "``" in line or line.lstrip().startswith("#"):
                continue  # doc markup / commentary, not a call site
            window = lines[max(i - 1, 0): i + 2]
            if not any("bounded:" in w or "per-batch" in w for w in window):
                offenders.append(f"{path.relative_to(root.parent)}:{i + 1}")
    assert not offenders, (
        "unannotated driver-materialization sites (add '# bounded: <why>' "
        f"or '# per-batch'): {offenders}"
    )
