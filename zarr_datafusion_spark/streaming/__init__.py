"""Structured Streaming operators (beyond-reference — the reference's
scan is strictly bounded, ``zarr_exec.rs:98-103``; SURVEY §1.6)."""

from zarr_datafusion_spark.streaming.demo import (
    sliding_window_rates,
    streaming_event_counts,
)

__all__ = ["streaming_event_counts", "sliding_window_rates"]
