"""Timing/roofline utilities.

The reference records CUDA events but never reads them (train.py:204-205,
443 — always logs 0); here timing is real. On the axon-tunneled TPU,
`block_until_ready` does not reliably fence, so timings force a 1-element
host transfer.
"""
from __future__ import annotations

import time
from typing import Any, Callable, Dict, Tuple

import jax
import numpy as np


def _sync(out) -> None:
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf.ravel()[0] if hasattr(leaf, "ravel") else leaf)


def time_fn(fn: Callable, *args, iters: int = 5, warmup: int = 1,
            **kwargs) -> Tuple[float, Any]:
    """Mean wall time (seconds) of fn(*args) with host-transfer fencing.

    The `iters` calls are dispatched back-to-back and fenced ONCE: the
    device executes queued programs serially, so wall/iters is the true
    per-call time plus 1/iters of the (tunnel) round-trip — fencing every
    call instead adds the full ~40-200 ms RTT to each sample on the
    remote-tunneled platform. Returns (seconds, last_output)."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
        _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    _sync(out)
    return (time.perf_counter() - t0) / iters, out


class StageTimes:
    """Accumulates named stage timings; prints a table and computes simple
    roofline ratios given achievable bandwidth/FLOPs."""

    def __init__(self) -> None:
        self.times: Dict[str, float] = {}

    def measure(self, name: str, fn: Callable, *args, **kwargs):
        dt, out = time_fn(fn, *args, **kwargs)
        self.times[name] = dt
        return out

    def report(self, work: Dict[str, Dict[str, float]] | None = None,
               peak_flops: float = 394e12 * 0.25,
               peak_bw: float = 800e9) -> Dict[str, Dict[str, float]]:
        """work: {stage: {"flops": F, "bytes": B}} optional roofline info.
        peak defaults: v5e-ish f32 compute and HBM bandwidth."""
        out = {}
        for name, dt in self.times.items():
            row = {"ms": dt * 1e3}
            if work and name in work:
                w = work[name]
                bound = max(w.get("flops", 0) / peak_flops,
                            w.get("bytes", 0) / peak_bw)
                row["roofline_ms"] = bound * 1e3
                row["of_roofline"] = dt / max(bound, 1e-12)
            out[name] = row
        return out
