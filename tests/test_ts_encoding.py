"""Regression: ``events.ts`` parquet encoding changes between driver
testdata regenerations (TIMESTAMP(NANOS) in rounds 1-2, timestamp[us]
from round 3). ``session.load_table`` / ``normalize_event_ts`` must
produce identical microsecond timestamps from BOTH encodings — the
round-3 regression was an unconditional ns workaround that crashed on
us files (batch) and silently divided us by 1000 (streaming).
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

# Deterministic fixture values (microseconds since epoch).
_US = [1_700_000_000_000_000 + i * 37_000_000 for i in range(25)]


def _write_events(tmpdir: str, unit: str) -> str:
    """Write a minimal events.parquet with ts at the given arrow unit."""
    sf_dir = os.path.join(tmpdir, f"sf_{unit}")
    os.makedirs(sf_dir, exist_ok=True)
    scale = {"us": 1, "ns": 1000}[unit]
    table = pa.table(
        {
            "event_id": pa.array(range(len(_US)), pa.int64()),
            "ts": pa.array([u * scale for u in _US], pa.timestamp(unit)),
            "user_id": pa.array([i % 5 for i in range(len(_US))], pa.int64()),
            "event_type": pa.array(["click"] * len(_US)),
            "value": pa.array([float(i) for i in range(len(_US))]),
            "props": pa.array(["{}"] * len(_US)),
        }
    )
    pq.write_table(table, os.path.join(sf_dir, "events.parquet"))
    return sf_dir


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_load_table_normalizes_both_encodings(spark, tmp_path, unit):
    from zarr_datafusion_spark.session import load_table

    sf_dir = _write_events(str(tmp_path), unit)
    df = load_table(spark, sf_dir, "events")
    assert df.schema["ts"].dataType.typeName() == "timestamp"
    got = sorted(r.ts for r in df.select("ts").collect())
    want = [
        dt.datetime.fromtimestamp(u / 1_000_000, dt.timezone.utc).replace(tzinfo=None)
        for u in _US
    ]
    assert got == want


def test_both_encodings_agree(spark, tmp_path):
    """The two physical encodings of the same instants must load to the
    exact same TIMESTAMP values (us precision, UTC session tz)."""
    from zarr_datafusion_spark.session import load_table

    us_df = load_table(spark, _write_events(str(tmp_path), "us"), "events")
    ns_df = load_table(spark, _write_events(str(tmp_path), "ns"), "events")
    us_vals = sorted(r.ts for r in us_df.select("ts").collect())
    ns_vals = sorted(r.ts for r in ns_df.select("ts").collect())
    assert us_vals == ns_vals


def test_event_stream_matches_batch(spark, tmp_path):
    """The streaming reader must see the SAME timestamps as the batch
    reader (round-3 bug: hardcoded LongType stream schema shrank us
    timestamps 1000x while the batch path crashed loudly)."""
    from zarr_datafusion_spark.session import load_table
    from zarr_datafusion_spark.streaming.demo import _event_stream, _run_to_memory

    sf_dir = _write_events(str(tmp_path), "us")
    batch = sorted(
        r.ts for r in load_table(spark, sf_dir, "events").select("ts").collect()
    )
    streamed = _run_to_memory(_event_stream(spark, sf_dir).select("ts"), "append")
    got = sorted(r.ts for r in streamed.collect())
    assert got == batch
