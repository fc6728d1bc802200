"""Opt-in phase clock for lifecycle bench entries.

The heaviest headline queries are multi-batch LIFECYCLE constructions
(staged feeds, quarantine windows, streaming drains): their total time
is dominated by fixture staging, so a real regression in the operator
under test would move the total by noise-level amounts. Queries mark
their internal phase boundaries with :func:`mark`; bench.py resets the
clock before each query and reads the spans after, emitting a
setup/operator/drain breakdown into BENCH_FULL.json ("phases") so
round-over-round comparison can gate on the phase that matters.

Zero-cost no-op outside the bench: mark() appends a (label, now) tuple
to a module list — no Spark interaction, nothing observable by the
query's result. The driver's correctness runs execute the same marks
harmlessly.

Convention: ``mark(label)`` CLOSES the span that began at the previous
mark (or at reset). The remainder — from the last mark to the noop-sink
materialization of the returned frame — is reported as
``final_query`` (lazy frames cost nothing until the sink runs, so the
returned query's own execution lands there).
"""

from __future__ import annotations

import time

_t0: float = 0.0
_marks: list[tuple[str, float]] = []


def reset() -> None:
    global _t0
    _t0 = time.time()
    _marks.clear()


def mark(label: str) -> None:
    _marks.append((label, time.time()))


def spans(end: float | None = None) -> dict[str, float]:
    """Label → span seconds, in mark order; ``end`` (the sink-completion
    time) closes the trailing ``final_query`` span."""
    out: dict[str, float] = {}
    prev = _t0
    for label, t in _marks:
        # repeated labels accumulate (loops over windows/batches)
        out[label] = round(out.get(label, 0.0) + (t - prev), 3)
        prev = t
    if end is not None and _marks:
        out["final_query"] = round(end - prev, 3)
    return out
