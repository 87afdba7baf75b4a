"""DAG-runner tests (pipelines/dag.py): deterministic topological order,
retry semantics, cycle/unknown-dep validation, and the end-to-end housing
DAG landing exactly the directly-composed serving dashboard."""

from __future__ import annotations

import pytest

from dataengineering_londonhousingmap_spark.pipelines.dag import DagError, Task, run_dag, topo_order


def test_topo_order_is_deterministic_and_respects_deps():
    tasks = [
        Task("z_last", lambda ctx: None, deps=["b", "a"]),
        Task("b", lambda ctx: None, deps=["a"]),
        Task("a", lambda ctx: None),
        Task("c", lambda ctx: None),
    ]
    order = topo_order(tasks)
    assert order == ["a", "c", "b", "z_last"]  # sorted-name frontier
    assert order.index("a") < order.index("b") < order.index("z_last")


def test_run_dag_passes_upstream_results():
    tasks = [
        Task("one", lambda ctx: 1),
        Task("two", lambda ctx: ctx["one"] + 1, deps=["one"]),
        Task("sum", lambda ctx: ctx["one"] + ctx["two"], deps=["one", "two"]),
    ]
    assert run_dag(tasks)["sum"] == 3


def test_retries_then_success_and_exhaustion():
    calls = {"n": 0}

    def flaky(ctx):
        calls["n"] += 1
        if calls["n"] < 3:
            raise ValueError("transient")
        return "ok"

    assert run_dag([Task("t", flaky, retries=2)])["t"] == "ok"
    assert calls["n"] == 3

    with pytest.raises(DagError, match="failed after 1 attempt"):
        run_dag([Task("boom", lambda ctx: 1 / 0)])


def test_validation_errors():
    with pytest.raises(DagError, match="unknown task"):
        topo_order([Task("a", lambda ctx: None, deps=["ghost"])])
    with pytest.raises(DagError, match="cycle"):
        topo_order([
            Task("a", lambda ctx: None, deps=["b"]),
            Task("b", lambda ctx: None, deps=["a"]),
        ])
    with pytest.raises(DagError, match="duplicate"):
        topo_order([Task("a", lambda ctx: None), Task("a", lambda ctx: None)])


def test_housing_dag_matches_direct_composition(spark, sf_dir):
    from dataengineering_londonhousingmap_spark.queries import QUERIES

    direct = QUERIES["q_serving_dashboard"](spark, sf_dir)
    via_dag = QUERIES["q_pipeline_dag"](spark, sf_dir)
    a = sorted(map(tuple, direct.collect()))
    b = sorted(map(tuple, via_dag.collect()))
    assert a == b and len(a) > 0
