"""Runtime observability: metrics registry, profiler traces, kernel stats.

The reference's observability is prints, a file logger, and TensorBoard
scalars (``kv_quant/evaluation_gsm8k.py:352-359,540``), plus wall-clock
timers around quantization (``llm/gptq.py:70,174``) and a per-token decode
benchmark (``llm/opt.py:332-378``). The TPU build centralizes that into:

- :class:`Metrics` — process-wide counters / gauges / timers with jsonl
  export (greppable, diffable; the artifact the eval harnesses write).
- :func:`trace` — context manager around ``jax.profiler.trace``; the only
  reliable timing tool through the axon relay (host wall-clock hides
  device behavior behind ~30 ms dispatch latency).
- :func:`device_kernel_stats` — aggregates a saved trace's device events
  by kernel name, the raw material for bandwidth accounting.
- :func:`achieved_bandwidth` / :func:`assert_bandwidth` — per-kernel
  HBM-bandwidth checks against a speed-of-light target, the "is this
  kernel DMA-bound yet" regression guard.
"""

from __future__ import annotations

import contextlib
import glob
import gzip
import json
import os
import re
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


class Metrics:
    """Counters, gauges, and timers with one-line jsonl export."""

    def __init__(self):
        self.counters: Dict[str, float] = defaultdict(float)
        self.gauges: Dict[str, float] = {}
        self.timers: Dict[str, list] = defaultdict(list)

    def count(self, name: str, n: float = 1.0):
        self.counters[name] += n

    def gauge(self, name: str, value: float):
        self.gauges[name] = float(value)

    @contextlib.contextmanager
    def timer(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.timers[name].append(time.perf_counter() - t0)

    def snapshot(self) -> dict:
        out = {"counters": dict(self.counters), "gauges": dict(self.gauges)}
        out["timers"] = {
            k: {"n": len(v), "total_s": sum(v), "min_s": min(v),
                "mean_s": sum(v) / len(v)}
            for k, v in self.timers.items() if v}
        return out

    def dump(self, path: str, **extra):
        """Append one json line (snapshot + extra fields + timestamp)."""
        rec = {"ts": time.time(), **self.snapshot(), **extra}
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        return rec


metrics = Metrics()          # default process-wide registry


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[str]:
    """jax.profiler.trace wrapper; yields the directory to analyze."""
    import jax

    with jax.profiler.trace(log_dir):
        yield log_dir


_SUFFIX = re.compile(r"\.\d+$")


def _iter_trace_events(trace_dir: str):
    for path in glob.glob(os.path.join(
            trace_dir, "**", "*.trace.json.gz"), recursive=True):
        with gzip.open(path, "rt") as f:
            doc = json.load(f)
        pid_names = {}
        for ev in doc.get("traceEvents", []):
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                pid_names[ev.get("pid")] = ev["args"].get("name", "")
        for ev in doc.get("traceEvents", []):
            if ev.get("ph") == "X" and "dur" in ev:
                yield pid_names.get(ev.get("pid"), ""), ev


def device_kernel_stats(trace_dir: str,
                        device_only: bool = True) -> Dict[str, dict]:
    """Aggregate completed events by kernel name.

    Returns {name: {count, total_us, mean_us}} with the ``.NNN``
    launch-index suffix stripped so replays of one kernel aggregate.
    ``device_only`` keeps rows whose process name looks like an
    accelerator stream (``/device:`` / TPU / XLA Op trace rows).
    """
    agg: Dict[str, dict] = {}
    for proc, ev in _iter_trace_events(trace_dir):
        if device_only and not any(
                t in proc for t in ("/device:", "TPU", "XLA Ops", "GPU")):
            continue
        name = _SUFFIX.sub("", ev.get("name", ""))
        a = agg.setdefault(name, {"count": 0, "total_us": 0.0})
        a["count"] += 1
        a["total_us"] += float(ev["dur"])
    for a in agg.values():
        a["mean_us"] = a["total_us"] / a["count"]
    return agg


def achieved_bandwidth(bytes_moved: int, seconds: float) -> float:
    """GB/s actually achieved for a kernel that moves ``bytes_moved``."""
    return bytes_moved / seconds / 1e9


def assert_bandwidth(bytes_moved: int, seconds: float,
                     target_gbps: float, fraction: float = 0.5,
                     name: str = "kernel") -> float:
    """Raise if a kernel achieves < fraction of the speed-of-light target
    (v5e HBM streams ~800 GB/s peak, ~380 GB/s measured through real
    GEMV kernels on this chip — see README 'Serving kernels')."""
    got = achieved_bandwidth(bytes_moved, seconds)
    if got < fraction * target_gbps:
        raise AssertionError(
            f"{name}: {got:.1f} GB/s < {fraction:.0%} of "
            f"{target_gbps:.0f} GB/s target")
    return got


def decode_token_stats(step_seconds: list, batch: int) -> dict:
    """Per-token decode latency summary (reference: llm/opt.py:332-378
    prints median per-token seconds)."""
    import statistics

    per_tok = sorted(step_seconds)
    return {
        "median_s": statistics.median(per_tok),
        "mean_s": sum(per_tok) / len(per_tok),
        "p90_s": per_tok[int(0.9 * (len(per_tok) - 1))],
        "tokens_per_s": batch / statistics.median(per_tok),
    }


def device_busy_us(trace_dir: str) -> float:
    """Interval-UNION of device-stream event time in a trace.

    Trace rows overlap both across streams (DMA vs compute) and within
    one lane (op hierarchy), so summing durations double-counts — a
    summed "device time" can exceed the wall clock. The union of
    [ts, ts+dur) intervals is the honest device-busy span.
    """
    iv = []
    for proc, ev in _iter_trace_events(trace_dir):
        if any(t in proc for t in ("/device:", "TPU", "XLA Ops", "GPU")):
            ts = float(ev.get("ts", 0.0))
            iv.append((ts, ts + float(ev["dur"])))
    iv.sort()
    covered, cur_s, cur_e = 0.0, None, None
    for s, e in iv:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                covered += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    if cur_e is not None:
        covered += cur_e - cur_s
    return covered
