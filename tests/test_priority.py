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
    monkeypatch.setattr(P, "_changed_map_since", lambda sha: {})
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
    monkeypatch.setattr(P, "_changed_map_since", lambda sha: {})
    out = P.auto_priority(names)
    assert out[0] == names[5], "stalest-evidence query must lead when nothing changed"


def test_auto_priority_math_changed_before_closure_touched(monkeypatch):
    """The round-4 crowding bug: a query whose defining module was edited
    since its own last green row must outrank queries that merely import a
    changed dependency — even when the math-changed query has FRESHER
    evidence."""
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.plans.registry import (
        REGISTRY,
    )

    names = list(REGISTRY)
    target = "m17_ae_imputation"
    defining = REGISTRY[target].spark.__module__.split(".", 1)[1]
    # everyone green in r1 (stale) except the target, green in r3 (fresh)
    rounds = {n: 1 for n in names}
    rounds[target] = 3
    monkeypatch.setattr(P, "_last_green_round", lambda: rounds)
    # only the target's OWN registered function changed since its green row
    own_fn = REGISTRY[target].spark.__name__
    monkeypatch.setattr(P, "_changed_map_since", lambda sha: {defining: {own_fn}})
    out = P.auto_priority(names)
    # every query defined in the edited module (math-changed) must precede
    # every query that merely imports it (closure-touched) — the target's
    # fresher evidence must not push it behind stale closure-touched rows
    math = {
        n for n in names if REGISTRY[n].spark.__module__.split(".", 1)[1] == defining
    }
    last_math = max(out.index(n) for n in math)
    closure_touched = [n for n in names if n not in math]
    first_other = min(out.index(n) for n in closure_touched)
    assert last_math < first_other or out.index(target) < first_other


def test_auto_priority_changed_is_relative_to_own_green_round(monkeypatch):
    """A query verified AFTER the edit landed is not 'changed'; one last
    verified BEFORE the same edit is."""
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.plans.registry import (
        REGISTRY,
    )

    names = list(REGISTRY)
    defining = REGISTRY[names[0]].spark.__module__.split(".", 1)[1]
    rounds = {n: 4 for n in names}
    rounds[names[0]] = 2  # verified before the edit
    monkeypatch.setattr(P, "_last_green_round", lambda: rounds)
    monkeypatch.setattr(P, "_verdict_commits", lambda: {2: "old", 4: "new"})
    own_fn = REGISTRY[names[0]].spark.__name__
    monkeypatch.setattr(
        P,
        "_changed_map_since",
        lambda sha: {defining: {own_fn}} if sha == "old" else {},
    )
    out = P.auto_priority(names)
    assert out[0] == names[0]


def test_import_graph_records_submodule_imports():
    """`from ..operators import anomaly` must record operators.anomaly, and
    `from .x import y` inside a package __init__ must anchor at the package
    (ml/__init__ imports resolve to ml.*, not bare names)."""
    g = P._import_graph()
    assert "operators.anomaly" in P._closure("plans.queries_timeseries", g)
    assert all(not d or "." in d or P._is_module(d) for deps in g.values() for d in deps)
    assert "ml.softpatch" in g.get("ml", set()) or "ml" not in g


def test_last_green_requires_positive_rows_for_no_oracle(tmp_path, monkeypatch):
    import json

    monkeypatch.setattr(P, "_REPO_ROOT", tmp_path)
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps(
            {
                "good": {"err": "no_oracle", "spark_rows": 5},
                "empty": {"err": "no_oracle", "spark_rows": 0},
                "hashed": {"hash_match": True, "spark_rows": 0},
            }
        )
    )
    last = P._last_green_round()
    assert last == {"good": 1, "hashed": 1}


def test_changed_names_ignores_pure_appends():
    """Appending a NEW operator to a module is a no-op for its existing
    consumers — it must not flip every query in the import closure to the
    changed category (the round-5 crowding mode)."""
    old = "def f(x):\n    return x + 1\n\nCONST = 3\n"
    new = old + "\n\ndef g(y):\n    return y * 2\n"
    assert P._changed_names(old, new) == set()


def test_changed_names_detects_edited_function_and_module_level():
    old = "def f(x):\n    return x + 1\n\nCONST = 3\n"
    edited_fn = "def f(x):\n    return x + 2\n\nCONST = 3\n"
    edited_const = "def f(x):\n    return x + 1\n\nCONST = 4\n"
    assert P._changed_names(old, edited_fn) == {"f"}
    assert P._changed_names(old, edited_const) == {"<module-level>"}
    # removal counts too
    assert "f" in P._changed_names(old, "CONST = 3\n")


def test_changed_names_includes_decorators():
    old = '@reg("a", oracle="SELECT 1")\ndef q():\n    pass\n'
    new = '@reg("a", oracle="SELECT 2")\ndef q():\n    pass\n'
    assert P._changed_names(old, new) == {"q"}
