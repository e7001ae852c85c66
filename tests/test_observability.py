"""Metrics registry, trace parsing, and bandwidth assertions."""

import gzip
import json
import os

import pytest

from microscopiq_tpu.utils.observability import (
    Metrics, achieved_bandwidth, assert_bandwidth, decode_token_stats,
    device_kernel_stats)


def test_metrics_counters_gauges_timers(tmp_path):
    m = Metrics()
    m.count("tokens", 5)
    m.count("tokens", 3)
    m.gauge("queue", 2)
    with m.timer("step"):
        pass
    with m.timer("step"):
        pass
    snap = m.snapshot()
    assert snap["counters"]["tokens"] == 8
    assert snap["gauges"]["queue"] == 2
    assert snap["timers"]["step"]["n"] == 2
    rec = m.dump(str(tmp_path / "metrics.jsonl"), run="r1")
    assert rec["run"] == "r1"
    lines = open(tmp_path / "metrics.jsonl").read().strip().split("\n")
    assert json.loads(lines[0])["counters"]["tokens"] == 8


def _write_trace(tmp_path, events):
    d = tmp_path / "plugins" / "profile" / "run1"
    os.makedirs(d)
    with gzip.open(d / "host.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    return str(tmp_path)


def test_device_kernel_stats_aggregates_and_strips_suffix(tmp_path):
    events = [
        {"ph": "M", "name": "process_name", "pid": 1,
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "name": "process_name", "pid": 2,
         "args": {"name": "python host"}},
        {"ph": "X", "pid": 1, "name": "fused_gemv.1", "dur": 100.0},
        {"ph": "X", "pid": 1, "name": "fused_gemv.2", "dur": 140.0},
        {"ph": "X", "pid": 2, "name": "host_thing", "dur": 999.0},
    ]
    stats = device_kernel_stats(_write_trace(tmp_path, events))
    assert set(stats) == {"fused_gemv"}
    assert stats["fused_gemv"]["count"] == 2
    assert stats["fused_gemv"]["mean_us"] == 120.0
    everything = device_kernel_stats(str(tmp_path), device_only=False)
    assert "host_thing" in everything


def test_bandwidth_assertions():
    assert achieved_bandwidth(380e9, 1.0) == pytest.approx(380.0)
    assert_bandwidth(200e9, 1.0, target_gbps=380, fraction=0.5)
    with pytest.raises(AssertionError):
        assert_bandwidth(100e9, 1.0, target_gbps=380, fraction=0.5)


def test_decode_token_stats():
    s = decode_token_stats([0.01, 0.02, 0.03], batch=8)
    assert s["median_s"] == 0.02
    assert s["tokens_per_s"] == pytest.approx(400.0)


def test_trace_context_produces_parseable_dir(tmp_path):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from microscopiq_tpu.utils.observability import trace

    with trace(str(tmp_path / "tr")):
        jnp.dot(jnp.ones((64, 64)), jnp.ones((64, 64))).block_until_ready()
    # CPU backends may or may not emit device rows; the parse must not
    # fail, and host rows must exist when suffix filtering is off
    stats = device_kernel_stats(str(tmp_path / "tr"), device_only=False)
    assert isinstance(stats, dict)


def test_device_busy_us_interval_union(tmp_path):
    """Overlapping device rows must union, not sum (a summed 'device
    time' exceeded the wall clock in bench.py before this)."""
    import gzip
    import json as _json

    from microscopiq_tpu.utils.observability import device_busy_us

    doc = {"traceEvents": [
        {"ph": "M", "name": "process_name", "pid": 1,
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "name": "process_name", "pid": 2,
         "args": {"name": "host"}},
        {"ph": "X", "pid": 1, "ts": 0, "dur": 100, "name": "a"},
        {"ph": "X", "pid": 1, "ts": 50, "dur": 100, "name": "b"},
        {"ph": "X", "pid": 1, "ts": 300, "dur": 50, "name": "c"},
        {"ph": "X", "pid": 2, "ts": 0, "dur": 9999, "name": "hostwork"},
    ]}
    d = tmp_path / "plugins"
    d.mkdir()
    with gzip.open(d / "x.trace.json.gz", "wt") as f:
        _json.dump(doc, f)
    # union: [0,150) + [300,350) = 200; host row excluded
    assert device_busy_us(str(tmp_path)) == 200.0
