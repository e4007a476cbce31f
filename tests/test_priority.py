"""The evidence-derived driver-gate ordering (plans/priority.py) is
driver-facing infrastructure: a bug silently reorders which queries get
correctness rows. Pin its moving parts without touching git state."""

from __future__ import annotations

from pathlib import Path

from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.plans import (
    priority as P,
)


def test_module_of_maps_package_files():
    assert P._module_of(P._PKG_ROOT / "ml" / "softpatch.py") == "ml.softpatch"
    assert P._module_of(P._PKG_ROOT / "plans" / "__init__.py") == "plans"
    assert P._module_of(P._PKG_ROOT / "plans" / "queries_ml.py") == "plans.queries_ml"
    # outside the package -> None
    assert P._module_of(Path("/tmp/foo.py")) is None


def test_import_graph_has_known_edges():
    g = P._import_graph()
    assert "ml.softpatch" in g["plans.queries_ml"]
    assert "plans.registry" in g["plans.queries_ml"]


def test_closure_reaches_deep_engine_deps():
    g = P._import_graph()
    cl = P._closure("plans.queries_ml", g)
    # queries_ml -> ml.softpatch -> operators.timeseries (two hops)
    assert "ml.softpatch" in cl
    assert "operators.timeseries" in cl
    # and the shared RNG, via the operators layer
    assert "functions.rng" in cl


def test_last_green_round_parses_history():
    last = P._last_green_round()
    # every query in the r1-r3 windows has some green round recorded
    assert last, "no CORRECTNESS history parsed"
    assert all(isinstance(v, int) and v >= 1 for v in last.values())


def test_auto_priority_is_permutation_and_total():
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.plans.registry import (
        REGISTRY,
    )

    names = list(REGISTRY)
    out = P.auto_priority(names)
    assert sorted(out) == sorted(names)
    assert len(out) == len(set(out))


def test_auto_priority_never_green_first(monkeypatch):
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.plans.registry import (
        REGISTRY,
    )

    names = list(REGISTRY)
    phantom = {n: 2 for n in names}
    phantom.pop(names[-1])  # the last registered query has no evidence
    monkeypatch.setattr(P, "_last_green_round", lambda: phantom)
    monkeypatch.setattr(P, "_changed_modules", lambda: set())
    out = P.auto_priority(names)
    assert out[0] == names[-1], "never-green query must lead the window"


def test_auto_priority_stalest_first(monkeypatch):
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.plans.registry import (
        REGISTRY,
    )

    names = list(REGISTRY)
    rounds = {n: 3 for n in names}
    rounds[names[5]] = 1  # stalest evidence
    monkeypatch.setattr(P, "_last_green_round", lambda: rounds)
    monkeypatch.setattr(P, "_changed_modules", lambda: set())
    out = P.auto_priority(names)
    assert out[0] == names[5], "stalest-evidence query must lead when nothing changed"
