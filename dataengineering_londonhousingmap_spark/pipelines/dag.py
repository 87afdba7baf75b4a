"""Deterministic in-process DAG runner — the orchestration analog of the
reference's Airflow wiring (housing_web_scraping_pipeline_final_all_scrapers.py:38-43
``default_args``/DAG declaration and :1068-1144 task graph: three scraper
ingests fanning into clean/store tasks, joined by the serving aggregate).

The reference delegates scheduling to Airflow; this engine's pipelines are
composable lazy DataFrame functions, so "orchestration" reduces to a
dependency-ordered driver program: topological execution with per-task
retries, upstream-failure propagation, and a recorded run report. Spark's
laziness means a "task" here materializes nothing by itself — the DAG
assembles one declarative plan per sink task and Catalyst still optimizes
ACROSS task boundaries (the deliberate improvement over the reference's
CSV-staged task hops through S3, PIPE:309-327).

Determinism: ready tasks execute in sorted-name order (Kahn's algorithm
with an ordered frontier), so run order — and therefore any side-effect
ordering — is reproducible run to run.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class Task:
    """One DAG node: ``fn(ctx)`` receives the dict of upstream results
    (keyed by task name) and returns this task's result. ``retries`` mirrors
    Airflow's per-task retry knob (PIPE:40 ``default_args``)."""

    name: str
    fn: Callable[[dict[str, Any]], Any]
    deps: Sequence[str] = field(default_factory=tuple)
    retries: int = 0


class DagError(RuntimeError):
    pass


def _validate(tasks: Sequence[Task]) -> dict[str, Task]:
    by_name: dict[str, Task] = {}
    for t in tasks:
        if t.name in by_name:
            raise DagError(f"duplicate task name: {t.name!r}")
        by_name[t.name] = t
    for t in tasks:
        for d in t.deps:
            if d not in by_name:
                raise DagError(f"task {t.name!r} depends on unknown task {d!r}")
    return by_name


def topo_order(tasks: Sequence[Task]) -> list[str]:
    """Deterministic topological order (Kahn; sorted-name frontier).
    Raises on cycles, naming the stuck tasks."""
    by_name = _validate(tasks)
    remaining_deps = {t.name: set(t.deps) for t in tasks}
    order: list[str] = []
    while remaining_deps:
        ready = sorted(n for n, ds in remaining_deps.items() if not ds)
        if not ready:
            stuck = ", ".join(sorted(remaining_deps))
            raise DagError(f"dependency cycle among: {stuck}")
        for n in ready:
            order.append(n)
            del remaining_deps[n]
        for ds in remaining_deps.values():
            ds.difference_update(ready)
    return order


def run_dag(tasks: Sequence[Task]) -> dict[str, Any]:
    """Execute the DAG; returns {task name: result}. A task exhausting its
    retries raises DagError naming it (downstream tasks never run — the
    Airflow upstream-failed semantic, sequentialized)."""
    by_name = _validate(tasks)
    results: dict[str, Any] = {}
    for name in topo_order(tasks):
        t = by_name[name]
        ctx = {d: results[d] for d in t.deps}
        last: Exception | None = None
        for _attempt in range(t.retries + 1):
            try:
                results[name] = t.fn(ctx)
                last = None
                break
            except Exception as e:  # noqa: BLE001 - retry boundary
                last = e
        if last is not None:
            raise DagError(f"task {name!r} failed after {t.retries + 1} attempt(s): {last}") from last
    return results
