"""Property-based tests (hypothesis) for the pure-python/numpy kernels —
fast, no Spark session needed."""

from __future__ import annotations

import datetime as dt

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from at_data_pipelines_spark.kernels.portfolio import project_simplex
from at_data_pipelines_spark.llmops.dedup import MINHASH_PRIME, minhash_coefficients
from at_data_pipelines_spark.pipelines.flows import reconstruct_membership
from at_data_pipelines_spark.pipelines.synthetic import trading_calendar


@given(
    st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=1, max_size=200)
)
@settings(max_examples=200, deadline=None)
def test_simplex_projection_properties(v):
    w = project_simplex(np.array(v, dtype=np.float64))
    assert abs(w.sum() - 1) < 1e-9
    assert (w >= 0).all()
    # idempotence: projecting a point already on the simplex is identity
    # (tolerance scales with input magnitude — theta is computed from
    # cumsums of the raw values)
    scale = max(1.0, np.abs(v).max())
    w2 = project_simplex(w)
    assert np.abs(w2 - w).max() < 1e-15 * scale + 1e-12
    # translation invariance along 1-vector: proj(v + c·1) == proj(v)
    w3 = project_simplex(np.array(v) + 7.5)
    assert np.abs(w3 - w).max() < 1e-14 * scale + 1e-9


@given(st.integers(1, 64), st.integers(0, 10_000))
@settings(max_examples=50, deadline=None)
def test_minhash_coefficients_bounds(k, seed):
    coefs = minhash_coefficients(k, seed)
    assert len(coefs) == k
    for a, b in coefs:
        assert 1 <= a < MINHASH_PRIME and 0 <= b < MINHASH_PRIME
        # overflow safety: a·h + b < 2^63 for any 28-bit base hash h
        assert a * (2**28 - 1) + b < 2**63
    # deterministic per seed
    assert coefs == minhash_coefficients(k, seed)


@given(st.integers(0, 2000))
@settings(max_examples=30, deadline=None)
def test_trading_calendar_deterministic_and_weekday(offset):
    start = dt.date(2020, 1, 1) + dt.timedelta(days=offset)
    end = start + dt.timedelta(days=90)
    cal = trading_calendar(start, end)
    assert cal == trading_calendar(start, end)
    assert all(d.weekday() < 5 for d in cal)
    assert cal == sorted(cal)


@given(
    st.lists(st.integers(0, 30), min_size=1, max_size=10, unique=True),
    st.integers(1, 5),
)
@settings(max_examples=50, deadline=None)
def test_reconstruct_membership_replays_forward(change_days, n_changes):
    """Reverse reconstruction then forward replay reproduces the final
    membership on every date."""
    cal = [dt.date(2024, 1, 1) + dt.timedelta(days=i) for i in range(31)]
    rng = np.random.default_rng(sum(change_days) + n_changes)
    tickers = [f"T{i}" for i in range(8)]
    members = set(tickers[:5])
    changes = []
    m = set(members)
    for day in sorted(change_days)[:n_changes]:
        candidates_add = [t for t in tickers if t not in m]
        candidates_rem = sorted(m)
        add = {candidates_add[0]} if candidates_add else set()
        rem = {candidates_rem[0]} if len(candidates_rem) > 1 else set()
        m = (m | add) - rem
        changes.append((cal[day], add, rem))
    current = m
    hist = reconstruct_membership(current, changes, cal)
    # forward replay check: membership on each date equals applying all
    # changes with date <= d to the initial state
    initial = set(hist[hist.date == cal[0]].ticker)
    mm = set(initial)
    ci = sorted(changes, key=lambda c: c[0])
    k = 0
    for d in cal:
        while k < len(ci) and ci[k][0] <= d:
            mm = (mm | ci[k][1]) - ci[k][2]
            k += 1
        assert set(hist[hist.date == d].ticker) == mm
    assert set(hist[hist.date == cal[-1]].ticker) == current


@given(st.integers(1, 5000), st.integers(1, 100))
@settings(max_examples=300, deadline=None)
def test_ntile_closed_form_matches_ansi_rule(n_rows, k):
    """ops.rank.ntile_from encodes NTILE's uneven-bucket rule closed-form:
    the first N mod k buckets get ⌈N/k⌉ rows, the rest ⌊N/k⌋. Check the
    formula (mirrored in pure python) against the explicit bucket list
    for every rank."""
    q, r = divmod(n_rows, k)
    cut = r * (q + 1)

    def formula(rank: int) -> int:
        import math

        if rank <= cut:
            return math.ceil(rank / (q + 1))
        return r + math.ceil((rank - cut) / max(q, 1))

    explicit = [
        bucket + 1
        for bucket in range(k)
        for _ in range(q + (1 if bucket < r else 0))
    ]
    assert len(explicit) == n_rows
    for rank in range(1, n_rows + 1):
        assert formula(rank) == explicit[rank - 1], (n_rows, k, rank)


@given(
    st.integers(1, 24),
    st.integers(1, 24),
    st.booleans(),
    st.lists(st.integers(0, 4), min_size=1, max_size=6),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=60, deadline=None)
def test_png_codec_roundtrip_property(h, w, gray, filters, seed):
    """encode_png → decode_image is the identity on uint8 pixels for any
    shape, gray/RGB, and any per-row scanline filter assignment."""
    from at_data_pipelines_spark.llmops.multimodal import decode_image, encode_png

    rng = np.random.default_rng(seed)
    shape = (h, w) if gray else (h, w, 3)
    px = rng.integers(0, 256, size=shape, dtype=np.uint8)
    buf = encode_png(px, row_filters=filters)
    ww, hh, mode, out = decode_image(buf)
    assert (ww, hh) == (w, h)
    assert mode == ("L" if gray else "RGB")
    assert np.array_equal(out, px)


@given(
    st.lists(
        st.floats(-1e9, 1e9, allow_nan=False).filter(lambda x: x == x),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=60, deadline=None)
def test_partition_value_escape_roundtrip(vals):
    """Hive partition-value escape/unescape round-trips arbitrary value
    spellings (incl. scientific notation, %, specials)."""
    from at_data_pipelines_spark.catalog import (
        _escape_partition_value,
        _unescape_partition_value,
    )

    for v in vals:
        s = repr(v)
        esc = _escape_partition_value(s)
        assert "/" not in esc and "=" not in esc.replace("%3D", "")
        assert _unescape_partition_value(esc) == s
