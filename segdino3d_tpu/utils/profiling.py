"""Profiling / tracing subsystem.

The reference has only wall-clock meters and CUDA max-memory logging
(``/root/reference/utils/metric_utils.py:175-208``, SURVEY.md 搂5); here the
TPU build exposes first-class XLA profiling:

* ``start_server(port)`` — live ``jax.profiler`` trace server (connect with
  TensorBoard / xprof);
* ``trace(dir)`` — context manager capturing a trace of the enclosed steps;
* ``annotate(name)`` — named TraceAnnotation visible in the timeline;
* ``device_memory_summary()`` — best-effort per-device memory stats.
"""
from __future__ import annotations

import contextlib
from typing import Optional

import jax


def start_server(port: int = 9999):
    return jax.profiler.start_server(port)


def start_trace(log_dir: str):
    """Begin an xprof trace capture (range-based: the train engine opens it
    at ``profile_steps[0]`` and closes at ``profile_steps[1]``)."""
    jax.profiler.start_trace(log_dir)


def stop_trace():
    jax.profiler.stop_trace()


@contextlib.contextmanager
def trace(log_dir: str):
    start_trace(log_dir)
    try:
        yield
    finally:
        stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


def device_memory_summary() -> str:
    lines = []
    for d in jax.devices():
        stats = None
        try:
            stats = d.memory_stats()
        except Exception:
            pass
        if stats:
            used = stats.get("bytes_in_use", 0) / 2 ** 30
            peak = stats.get("peak_bytes_in_use", 0) / 2 ** 30
            lines.append(f"{d}: {used:.2f} GiB in use, {peak:.2f} GiB peak")
        else:
            lines.append(f"{d}: memory stats unavailable")
    return "\n".join(lines)
