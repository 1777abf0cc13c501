"""Device tracing / profiling hooks (SURVEY.md §5: the reference ships no
tracing; production block verification needs per-kernel visibility).

Two tools:

- ``trace(dir)``: context manager around ``jax.profiler`` — captures an XLA
  trace viewable in TensorBoard/Perfetto.  No-op when jax is unavailable.
- ``kernel_report()``: summarize the in-process metrics registry into a
  human-readable table (spans + counters), for quick CLI inspection.

Usage:
    from xelis_he_tpu.utils.profiling import trace, kernel_report
    with trace("/tmp/xhe-trace"):
        verify_batch(txs, state, accel=accel)
    print(kernel_report())
"""

from __future__ import annotations

from contextlib import contextmanager

from ..metrics import metrics


@contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """Capture a jax/XLA profiler trace around the block (TensorBoard
    format).  Falls back to a no-op without jax."""
    try:
        import jax
    except Exception:  # pragma: no cover
        yield
        return
    with jax.profiler.trace(log_dir, create_perfetto_link=create_perfetto_link):
        yield


@contextmanager
def annotate(name: str):
    """Named region that shows up inside device traces (TraceAnnotation)."""
    try:
        import jax

        with jax.profiler.TraceAnnotation(name):
            yield
    except Exception:  # pragma: no cover
        yield


def kernel_report(reset: bool = False) -> str:
    """Render the metrics registry as an aligned text table."""
    snap = metrics.snapshot()
    lines = []
    spans = snap["span_seconds"]
    counts = snap["span_counts"]
    if spans:
        lines.append("spans (total ms / calls):")
        width = max(len(k) for k in spans)
        for k in sorted(spans):
            lines.append(f"  {k:<{width}}  {spans[k] * 1000:9.2f}  {counts.get(k, 0):6d}")
    if snap["counters"]:
        lines.append("counters:")
        width = max(len(k) for k in snap["counters"])
        for k, v in sorted(snap["counters"].items()):
            lines.append(f"  {k:<{width}}  {v:12.0f}")
    if reset:
        metrics.reset()
    return "\n".join(lines) or "(no metrics recorded)"
