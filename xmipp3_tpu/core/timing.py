"""Tracing / profiling subsystem.

SURVEY §5.1: the reference's timing is ad-hoc (#ifdef TIMING blocks around
hot phases, angular_projection_matching.cpp:640). The TPU build makes it
first-class: `timed_phase` scopes accumulate wall-clock per phase (printed
at exit when enabled), and `trace` wraps a region in a jax.profiler trace
(viewable in xprof/TensorBoard). Every program accepts `--trace <dir>`
(tryRun wraps run()) and phase timing turns on with verbosity >= 2 or
XMIPP_TIMING=1.
"""
from __future__ import annotations

import atexit
import os
import time
from collections import defaultdict
from contextlib import contextmanager

_ACCUM: dict[str, list] = defaultdict(lambda: [0.0, 0])
_ENABLED = None


def timing_enabled() -> bool:
    global _ENABLED
    if _ENABLED is None:
        _ENABLED = os.environ.get("XMIPP_TIMING", "0") not in ("0", "")
    return _ENABLED


def enable_timing(on: bool = True) -> None:
    global _ENABLED
    _ENABLED = on


@contextmanager
def timed_phase(name: str, sync=None):
    """Accumulate wall-clock for a named phase.

    Pass `sync` a JAX array (or pytree leaf) factory result to block on so
    async dispatch doesn't hide device time: timed_phase("x", sync=result).
    """
    if not timing_enabled():
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync is not None:
            try:
                import jax
                jax.block_until_ready(sync)
            except Exception:
                pass
        dt = time.perf_counter() - t0
        _ACCUM[name][0] += dt
        _ACCUM[name][1] += 1


def timing_report() -> str:
    if not _ACCUM:
        return ""
    lines = ["-- phase timing --"]
    for name, (tot, n) in sorted(_ACCUM.items(), key=lambda kv: -kv[1][0]):
        lines.append(f"  {name:<32s} {tot:8.3f} s  ({n} calls, "
                     f"{tot / max(n, 1) * 1e3:7.1f} ms/call)")
    return "\n".join(lines)


def _report_at_exit():
    if timing_enabled() and _ACCUM:
        print(timing_report())


atexit.register(_report_at_exit)


@contextmanager
def trace(trace_dir: str | None):
    """jax.profiler trace scope (xprof/TensorBoard viewable). No-op when
    trace_dir is falsy or the profiler is unavailable."""
    if not trace_dir:
        yield
        return
    try:
        import jax
        os.makedirs(trace_dir, exist_ok=True)
        with jax.profiler.trace(trace_dir):
            yield
        print(f"profiler trace -> {trace_dir}")
    except Exception as e:                          # pragma: no cover
        print(f"WARNING: profiler trace failed ({e}); running untraced")
        yield
