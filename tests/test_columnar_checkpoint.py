"""Columnar checkpoint (r10): past _COLUMNAR_CHECKPOINT_MIN_ENTRIES
tracked entries, _save_meta moves the two O(table) dicts (committed,
zone_maps) out of _bl_meta.json into an immutable version-named parquet
sidecar, leaving an atomic JSON pointer — a cold handle's first load
pays a multithreaded parquet decode instead of the single-threaded JSON
parse that measured ~9 s at 1M entries (SCALING.md). These tests force
the threshold down and check the format is OBSERVATIONALLY IDENTICAL to
the inline shape: same state from a fresh handle, same table contents,
time travel intact (history archives stay full JSON), sidecar GC keeps a
bounded set, and the pointer-chase retry survives a GC'd sidecar.
"""

from __future__ import annotations

import datetime
import json

import pytest
from pyspark.sql import types as T

from at_data_pipelines_spark.catalog import Lakehouse

SCHEMA = T.StructType(
    [
        T.StructField("ticker", T.StringType()),
        T.StructField("date", T.DateType()),
        T.StructField("year", T.IntegerType()),
        T.StructField("close", T.DoubleType()),
    ]
)


def _df(spark, rows):
    return spark.createDataFrame(
        [(t, datetime.date.fromisoformat(d), int(d[:4]), c) for t, d, c in rows],
        SCHEMA,
    )


@pytest.fixture
def columnar():
    """Force every checkpoint through the columnar path (and every
    commit through the segmented log, the mode a table this large would
    really be in)."""
    orig_col = Lakehouse._COLUMNAR_CHECKPOINT_MIN_ENTRIES
    orig_seg = Lakehouse._LOG_SEGMENT_THRESHOLD
    Lakehouse._COLUMNAR_CHECKPOINT_MIN_ENTRIES = 1
    Lakehouse._LOG_SEGMENT_THRESHOLD = 0
    yield
    Lakehouse._COLUMNAR_CHECKPOINT_MIN_ENTRIES = orig_col
    Lakehouse._LOG_SEGMENT_THRESHOLD = orig_seg


def _state(lake, name):
    m = lake._load_meta(name)
    return (
        m.version,
        dict(m.committed),
        sorted(m.live_deltas),
        dict(m.zone_maps),
        m.primary_keys,
        m.table_uuid,
    )


def test_entries_parquet_round_trip():
    """The sidecar codec must reproduce both dicts exactly — including
    non-ASCII keys, the unpartitioned "" rel, and mixed-type zone-map
    bounds (numbers, strings, nulls)."""
    committed = {"": 3, "year=2024": 7, "year=2025/t=α β": 12}
    zone_maps = {
        "_seq=3": {"close": [1.5, 99.0], "ticker": ["AAPL", "ZÜR"]},
        "_seq=7/year=2024": {"close": [None, 4.0]},
    }
    data = Lakehouse._entries_to_parquet(committed, zone_maps)
    c2, z2 = Lakehouse._entries_from_parquet(data)
    assert c2 == committed
    assert z2 == zone_maps
    # empty dicts round-trip too (a truncated table's checkpoint)
    c3, z3 = Lakehouse._entries_from_parquet(Lakehouse._entries_to_parquet({}, {}))
    assert c3 == {} and z3 == {}


def test_columnar_checkpoint_matches_inline_state(spark, tmp_path, columnar):
    """A fresh handle reading the columnar checkpoint must see exactly
    the state the committing handle holds, across enough commits to
    cross several checkpoint cadences; the JSON itself must no longer
    carry the inline dicts."""
    lake = Lakehouse(spark, str(tmp_path / "lake"))
    lake.create(
        "t", SCHEMA, ["year"], ["ticker", "date"], stats_columns=["close"]
    )
    n = 2 * Lakehouse._LOG_CHECKPOINT_EVERY + 3
    for i in range(n):
        lake.upsert(
            "t",
            _df(spark, [(f"T{i % 3}", f"{2020 + i % 4}-01-{2 + i % 27:02d}", float(i))]),
        )
        assert _state(lake, "t") == _state(Lakehouse(spark, lake.root), "t"), i
    raw_json = json.loads(lake.fs.read_text(lake._meta_path("t")))
    assert "_entries_file" in raw_json
    assert "committed" not in raw_json and "zone_maps" not in raw_json
    assert lake.table("t").count() == lake.table("t").dropDuplicates(
        ["ticker", "date"]
    ).count() == len({(f"T{i % 3}", f"{2020 + i % 4}-01-{2 + i % 27:02d}") for i in range(n)})


def test_sidecar_gc_keeps_bounded_set(spark, tmp_path, columnar):
    """Each checkpoint writes a new immutable sidecar; the save GC must
    keep at most the current + previous (a reader holding the old JSON
    may still be fetching its sidecar) and reap the rest."""
    lake = Lakehouse(spark, str(tmp_path / "lake"))
    lake.create("t", SCHEMA, [], ["ticker", "date"])
    for i in range(4 * Lakehouse._LOG_CHECKPOINT_EVERY + 2):
        lake.upsert("t", _df(spark, [("A", f"2024-{1 + i // 27:02d}-{1 + i % 27:02d}", float(i))]))
    sidecars = lake._entries_sidecars("t")
    assert 1 <= len(sidecars) <= 2, sidecars


def test_time_travel_unaffected_by_columnar_checkpoint(spark, tmp_path, columnar):
    """_history/ anchors keep FULL inline JSON, so time travel must
    reconstruct old versions regardless of the live checkpoint format."""
    lake = Lakehouse(spark, str(tmp_path / "lake"))
    lake.create("t", SCHEMA, [], ["ticker", "date"], retain_versions=100)
    n = Lakehouse._LOG_CHECKPOINT_EVERY + 5
    versions = []
    for i in range(n):
        lake.upsert("t", _df(spark, [("A", f"2024-01-{2 + i % 27:02d}", float(i))]))
        versions.append(lake._load_meta("t").version)
    mid = versions[len(versions) // 2]
    # dates are distinct for i < 27, so version `mid` holds exactly one
    # row per upsert committed up to it
    assert lake.table("t", version=mid).count() == versions.index(mid) + 1
    assert len(lake.history("t")) >= n


def test_inflate_survives_gcd_sidecar(spark, tmp_path, columnar):
    """A reader that parsed the JSON just before two checkpoints landed
    finds its sidecar GC'd — _inflate_entries must chase the pointer by
    re-reading the JSON, not fail or serve a partial manifest."""
    lake = Lakehouse(spark, str(tmp_path / "lake"))
    lake.create("t", SCHEMA, [], ["ticker", "date"])
    for i in range(Lakehouse._LOG_CHECKPOINT_EVERY + 1):
        lake.upsert("t", _df(spark, [("A", f"2024-01-{2 + i:02d}", float(i))]))
    stale_raw = json.loads(lake.fs.read_text(lake._meta_path("t")))
    assert "_entries_file" in stale_raw
    # advance two checkpoint cadences: the stale pointer's sidecar is GC'd
    for i in range(2 * Lakehouse._LOG_CHECKPOINT_EVERY + 2):
        lake.upsert("t", _df(spark, [("B", f"2024-02-{1 + i % 27:02d}", float(i))]))
    assert stale_raw["_entries_file"] not in lake._entries_sidecars("t")
    fresh = Lakehouse(spark, lake.root)
    inflated = fresh._inflate_entries("t", stale_raw)
    assert inflated["committed"], "pointer chase returned an empty manifest"
    assert "_entries_file" not in inflated
    # the chase lands on the CURRENT checkpoint (newer than the stale
    # one); the remaining distance to the live version is the post-
    # checkpoint segments, which _read_meta_raw folds on top as usual
    assert inflated["version"] > stale_raw["version"]
    assert fresh._load_meta("t").version == lake._load_meta("t").version


def test_replace_clears_sidecars(spark, tmp_path, columnar):
    """create(mode='replace') starts a new life: old-life sidecars must
    not linger in the table dir."""
    lake = Lakehouse(spark, str(tmp_path / "lake"))
    lake.create("t", SCHEMA, [], ["ticker", "date"])
    for i in range(Lakehouse._LOG_CHECKPOINT_EVERY + 1):
        lake.upsert("t", _df(spark, [("A", f"2024-01-{2 + i:02d}", float(i))]))
    assert lake._entries_sidecars("t")
    lake.create("t", SCHEMA, [], ["ticker", "date"], mode="replace")
    assert lake._entries_sidecars("t") == []
    assert lake.table("t").count() == 0


def test_below_threshold_stays_inline(spark, tmp_path):
    """With the production threshold, a small table's checkpoint stays
    plain inline JSON — no sidecar, no pointer."""
    lake = Lakehouse(spark, str(tmp_path / "lake"))
    lake.create("t", SCHEMA, [], ["ticker", "date"])
    lake.upsert("t", _df(spark, [("A", "2024-01-02", 1.0)]))
    raw = json.loads(lake.fs.read_text(lake._meta_path("t")))
    assert "committed" in raw and "_entries_file" not in raw
    assert lake._entries_sidecars("t") == []


def test_objstore_scheme_defaults_to_columnar(spark, tmp_path, monkeypatch):
    """r11: with the class threshold at its 0 default, an object-store
    scheme (simulated by stamping the fs) flips to the columnar shape
    past _COLUMNAR_CHECKPOINT_OBJSTORE_MIN_ENTRIES, while file:// stays
    inline at the same size — the SCALING.md simulated-store rung's
    decision, wired in."""
    monkeypatch.setattr(Lakehouse, "_COLUMNAR_CHECKPOINT_OBJSTORE_MIN_ENTRIES", 1)
    lake = Lakehouse(spark, str(tmp_path / "lake"))
    lake.create("t", SCHEMA, [], ["ticker", "date"])
    rows = [("A", "2024-01-02", 1.0), ("B", "2024-01-03", 2.0), ("C", "2024-01-06", 3.0)]
    lake.upsert("t", _df(spark, rows))
    # file:// root: inline even though n_entries >= objstore threshold
    raw = json.loads(lake.fs.read_text(lake._meta_path("t")))
    assert "_entries_file" not in raw and lake._entries_sidecars("t") == []
    # same handle re-stamped as an object store: next save goes columnar
    lake.fs.scheme = "s3a"
    lake.upsert("t", _df(spark, [("D", "2024-01-07", 4.0)]))
    raw = json.loads(lake.fs.read_text(lake._meta_path("t")))
    assert "_entries_file" in raw, "objstore root should default columnar"
    # state must round-trip through the sidecar on a fresh handle
    fresh = Lakehouse(spark, lake.root)
    fresh.fs.scheme = "s3a"
    m = fresh._load_meta("t")
    assert m.committed, "committed dict must round-trip through the sidecar"
    assert fresh.table("t").count() == 4


def test_negative_threshold_forces_inline_on_objstore_scheme(spark, tmp_path, monkeypatch):
    """Review r11: -1 is the escape hatch forcing inline JSON everywhere
    — external tooling that parses committed/zone_maps out of the
    checkpoint directly must have a way to keep them inline on s3a."""
    monkeypatch.setattr(Lakehouse, "_COLUMNAR_CHECKPOINT_OBJSTORE_MIN_ENTRIES", 1)
    monkeypatch.setattr(Lakehouse, "_COLUMNAR_CHECKPOINT_MIN_ENTRIES", -1)
    lake = Lakehouse(spark, str(tmp_path / "lake"))
    lake.fs.scheme = "s3a"
    lake.create("t", SCHEMA, [], ["ticker", "date"])
    lake.upsert("t", _df(spark, [("A", "2024-01-02", 1.0)]))
    raw = json.loads(lake.fs.read_text(lake._meta_path("t")))
    assert "committed" in raw and "_entries_file" not in raw
    assert lake._entries_sidecars("t") == []
