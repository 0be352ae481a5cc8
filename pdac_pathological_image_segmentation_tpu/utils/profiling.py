"""Tracing / profiling subsystem.

The reference has none (tqdm progress bars only, SURVEY.md §5).  Here:

* :class:`StepTimer` — lightweight per-step wall-clock stats (p50/p95/mean),
  reported per epoch without forcing device syncs;
* :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-loadable device trace (works on TPU including remote
  backends); enabled per-epoch via the ``profile_epoch`` config extra;
* :func:`device_op_summary` — parse a written trace and aggregate device op
  time (the tool used to find this framework's own hot ops).
"""

from __future__ import annotations

import contextlib
import glob
import gzip
import json
import os
import time
from typing import Dict, List, Optional

import numpy as np


class StepTimer:
    def __init__(self) -> None:
        self._times: List[float] = []
        self._last: Optional[float] = None

    def start(self) -> None:
        self._last = time.perf_counter()

    def stop(self) -> None:
        if self._last is not None:
            self._times.append(time.perf_counter() - self._last)
            self._last = None

    def summary(self) -> Dict[str, float]:
        if not self._times:
            return {}
        t = np.asarray(self._times)
        return {
            "steps": int(t.size),
            "mean_ms": float(t.mean() * 1e3),
            "p50_ms": float(np.percentile(t, 50) * 1e3),
            "p95_ms": float(np.percentile(t, 95) * 1e3),
        }

    def reset(self) -> None:
        self._times.clear()
        self._last = None


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax profiler trace into ``log_dir`` (TensorBoard 'profile'
    plugin format)."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_op_summary(trace_dir: str, top: int = 20) -> List[tuple]:
    """Aggregate device-side op durations from the newest trace in
    ``trace_dir``.  Returns [(total_us, op_name, hlo_long_name), ...]."""
    files = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                  recursive=True)
    )
    if not files:
        return []
    with gzip.open(files[-1]) as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    device_pids = {
        e["pid"] for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    agg: Dict[str, list] = {}
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            name = e.get("name", "?")
            if name.startswith("jit_"):
                continue
            row = agg.setdefault(name, [0, ""])
            row[0] += e.get("dur", 0)
            if not row[1]:
                row[1] = str((e.get("args") or {}).get("long_name", ""))[:200]
    out = sorted(((v[0], k, v[1]) for k, v in agg.items()), reverse=True)
    return out[:top]
