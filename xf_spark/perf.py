"""Per-operation performance budgets (perf.rs:25-178 re-expressed for
the Spark serving tier).

The reference declares (target, warning, panic) durations per
operation, logs on warning, and fails CI on panic. Here:

- budgets carry (target_ms, warning_ms, critical_ms) calibrated to the
  WARM serving path on local mode (the term-LRU path: lexical ~60 ms,
  phrase ~80 ms at sf0.1) with critical set generously above this
  host's measured ±3x wall-time noise;
- ``timed(name)`` wraps an operation: ~µs overhead, logs on
  warning/critical, and records the grade in ``LAST`` for doctor/CI;
- ``run_doctor`` grades its sample query against ``search_simple``;
  the pytest budget suite fails only on ``critical`` (CI-enforcement
  analog of Budget::exceeds_panic, perf.rs:84-86).
"""

from __future__ import annotations

import logging
import time
from contextlib import contextmanager
from dataclasses import dataclass

log = logging.getLogger(__name__)


@dataclass(frozen=True)
class Budget:
    name: str
    target_ms: float
    warning_ms: float
    critical_ms: float

    def grade(self, ms: float) -> str:
        if ms <= self.target_ms:
            return "within"
        if ms <= self.warning_ms:
            return "acceptable"
        if ms <= self.critical_ms:
            return "warning"
        return "critical"


# Serving budgets (warm path). The reference's sub-ms targets assume an
# in-process mmap'd index; the Spark analog's floor is the term-LRU
# NumPy eval + local-relation round-trip (~60 ms measured), so targets
# sit just above that and critical sits above worst-case host noise.
BUDGETS = {
    "search_simple": Budget("search_simple", 100, 500, 3000),
    "search_phrase": Budget("search_phrase", 150, 800, 4000),
    "search_complex": Budget("search_complex", 150, 800, 4000),
    "search_filtered": Budget("search_filtered", 300, 1500, 6000),
    "search_wildcard": Budget("search_wildcard", 150, 800, 4000),
    "msearch_per_query": Budget("msearch_per_query", 20, 100, 1000),
    # build-side (per 1k docs; INDEX_BATCH analog)
    "index_batch_1k": Budget("index_batch_1k", 200, 1000, 20000),
}

# most recent grade per budget name: {"name": (ms, grade)}
LAST: dict[str, tuple[float, str]] = {}


def record(name: str, seconds: float) -> str:
    """Record an already-measured duration against a budget."""
    b = BUDGETS[name]
    ms = seconds * 1000.0
    g = b.grade(ms)
    LAST[name] = (ms, g)
    if g == "critical":
        log.error("perf budget CRITICAL: %s took %.0f ms (> %.0f)",
                  name, ms, b.critical_ms)
    elif g == "warning":
        log.warning("perf budget exceeded: %s took %.0f ms (> %.0f)",
                    name, ms, b.warning_ms)
    return g


@contextmanager
def timed(name: str):
    """Time a block against BUDGETS[name]; log + record the grade."""
    b = BUDGETS[name]
    assert b is not None
    t0 = time.time()
    try:
        yield
    finally:
        record(name, time.time() - t0)


def budget_for_plan(plan, filtered: bool) -> str:
    """Map a parsed query AST to its budget name (perf.rs search_*)."""
    if filtered:
        return "search_filtered"

    def kinds(node, acc):
        acc.add(node[0])
        if node[0] in ("and", "or", "msm"):
            for c in node[1]:
                kinds(c, acc)
        elif node[0] == "not":
            kinds(node[1], acc)
            kinds(node[2], acc)
        elif node[0] == "boost":
            kinds(node[1], acc)
        return acc

    ks = kinds(plan, set())
    if "phrase" in ks or "near" in ks or "window" in ks:
        return "search_phrase"
    if "prefix" in ks:
        return "search_wildcard"
    if ks & {"and", "or", "not", "msm"}:
        return "search_complex"
    return "search_simple"
