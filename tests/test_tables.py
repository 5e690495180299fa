"""load_table must normalize BOTH events.ts physical types the driver
testdata has shipped (TIMESTAMP(NANOS) rounds 1-3, timestamp[us] NTZ
round 4+) to the same session-zoned TIMESTAMP column — the round-4
testdata regeneration broke every events query until the dispatch
landed; this pins the contract."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from convoy_spark.tables import load_table

ROWS = {
    "event_id": [1, 2],
    "user_id": [10, 20],
    "event_type": ["a", "b"],
    "value": [1.5, 2.5],
    "props": ["{}", "{}"],
}
# 2024-01-01T00:00:00.123456 in micros
US = 1_704_067_200_123_456


def _write(tmp_path, ts_array):
    t = pa.table({**ROWS, "ts": ts_array})
    # column order must match the real table
    t = t.select(["event_id", "ts", "user_id", "event_type", "value", "props"])
    d = tmp_path / "sfx"
    d.mkdir(exist_ok=True)
    pq.write_table(t, str(d / "events.parquet"))
    return str(d)


def test_load_events_nanos(spark, tmp_path):
    ts = pa.array([US * 1000, (US + 1) * 1000], pa.timestamp("ns"))
    df = load_table(spark, _write(tmp_path, ts), "events")
    assert df.schema["ts"].dataType.simpleString() == "timestamp"
    got = sorted(r.ts.isoformat() for r in df.select("ts").collect())
    assert got[0] == "2024-01-01T00:00:00.123456"


def test_load_events_micros_ntz(spark, tmp_path):
    ts = pa.array([US, US + 1], pa.timestamp("us"))
    df = load_table(spark, _write(tmp_path, ts), "events")
    assert df.schema["ts"].dataType.simpleString() == "timestamp"
    got = sorted(r.ts.isoformat() for r in df.select("ts").collect())
    assert got[0] == "2024-01-01T00:00:00.123456"
