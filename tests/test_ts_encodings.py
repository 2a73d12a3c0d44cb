"""Regression guard for events.ts fixture-encoding drift.

The driver's fixture generator changed events.ts from Parquet
TIMESTAMP(NANOS) (rounds 1-2) to timestamp[us] (round 3), which broke the
batch reader loudly (unix_micros on TIMESTAMP_NTZ) and the streaming source
silently (LongType schema + div 1000 compressed every timestamp 1000x).
This test writes the same logical rows in all three plausible encodings and
asserts BOTH readers decode them to identical Spark TIMESTAMP values, so
the next encoding flip fails here instead of in the driver gate.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mini_hive_server_spark.catalog import _read_events, events_ts_encoding
from mini_hive_server_spark.streaming.events_stream import (
    read_events_stream,
    run_to_memory,
)

# logical rows: three events, microsecond-precision timestamps
_US = [1704067200_000000, 1704067260_500000, 1704070860_250000]  # 2024-01-01
_ROWS = {
    "event_id": [0, 1, 2],
    "user_id": [10, 11, 10],
    "event_type": ["click", "purchase", "click"],
    "value": [1.5, 2.5, 3.5],
    "props": ['{"k": 1}', '{"k": 2}', '{"k": 3}'],
}


def _write(dirname: str, ts_array: pa.Array) -> str:
    os.makedirs(dirname, exist_ok=True)
    table = pa.table(
        {
            "event_id": pa.array(_ROWS["event_id"], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array(_ROWS["user_id"], pa.int64()),
            "event_type": pa.array(_ROWS["event_type"], pa.string()),
            "value": pa.array(_ROWS["value"], pa.float64()),
            "props": pa.array(_ROWS["props"], pa.string()),
        }
    )
    pq.write_table(table, os.path.join(dirname, "events.parquet"))
    return dirname


@pytest.fixture(scope="module")
def encoded_dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("ts_encodings")
    dirs = {}
    dirs["ns"] = _write(
        str(base / "ns"), pa.array([u * 1000 for u in _US], pa.timestamp("ns"))
    )
    dirs["ntz_us"] = _write(str(base / "ntz_us"), pa.array(_US, pa.timestamp("us")))
    dirs["ltz"] = _write(
        str(base / "ltz"), pa.array(_US, pa.timestamp("us", tz="UTC"))
    )
    return dirs


def test_probe_identifies_each_encoding(encoded_dirs):
    for kind, d in encoded_dirs.items():
        assert events_ts_encoding(d) == kind, f"probe misread {d}"


def test_batch_reader_normalizes_all_encodings(encoded_dirs, spark):
    results = {}
    for kind, d in encoded_dirs.items():
        df = _read_events(spark, d)
        assert dict(df.dtypes)["ts"] == "timestamp", f"{kind}: {df.dtypes}"
        results[kind] = sorted(
            (r.event_id, r.ts.isoformat()) for r in df.select("event_id", "ts").collect()
        )
    assert results["ns"] == results["ntz_us"] == results["ltz"]
    # and the values are the intended microsecond instants, not 1000x off
    assert results["ntz_us"][0] == (0, "2024-01-01T00:00:00")


def test_stream_reader_normalizes_all_encodings(encoded_dirs, spark):
    results = {}
    for kind, d in encoded_dirs.items():
        stream = read_events_stream(spark, d)
        sink = f"ts_enc_{kind}"
        run_to_memory(stream, sink, output_mode="append")
        results[kind] = sorted(
            (r.event_id, r.ts.isoformat())
            for r in spark.table(sink).select("event_id", "ts").collect()
        )
    assert results["ns"] == results["ntz_us"] == results["ltz"]
    assert results["ntz_us"][-1] == (2, "2024-01-01T01:01:00.250000")


def test_current_fixture_decodes_to_timestamp(spark):
    from .conftest import SF_SMOKE

    df = _read_events(spark, SF_SMOKE)
    assert dict(df.dtypes)["ts"] == "timestamp"
    # sanity: fixture timestamps are in a real epoch range (2020s), not
    # 1970-adjacent garbage from a mis-decoded int64
    row = df.selectExpr("min(year(ts)) AS y0", "max(year(ts)) AS y1").first()
    assert 2000 <= row.y0 <= row.y1 <= 2100
