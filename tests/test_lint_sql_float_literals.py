"""Doctrine guard: no raw repr-float embedding in generated SQL.

Round 12's hypothesis run proved DuckDB's bare-literal parser is not
correctly rounded (functions/exact.py lit_double docstring), so every float
that crosses into SQL text must route through ``lit_double``. This lint
keeps the door shut: the idioms that used to carry floats into oracle SQL
(``{x!r}::DOUBLE``, ``CAST({x!r} AS DOUBLE)``, ``CAST('{x!r}' AS DOUBLE)``,
``{x!r}D``) must not reappear in the package source. String-level, so it
can't catch every conceivable embedding — the 1000-example property tests
in test_exact_quantizer.py cover the emitter itself — but it catches the
patterns that actually existed.
"""

from __future__ import annotations

import re
from pathlib import Path

PKG = (
    Path(__file__).resolve().parents[1]
    / "unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark"
)

# {EXPR!r}::DOUBLE | CAST({EXPR!r} AS DOUBLE) | CAST('{EXPR!r}' AS DOUBLE) | {EXPR!r}D
_FORBIDDEN = re.compile(
    r"\{[^{}]*!r\}::DOUBLE"
    r"|CAST\(\{[^{}]*!r\} AS DOUBLE\)"
    r"|CAST\('\{[^{}]*!r\}' AS DOUBLE\)"
    r"|\{[^{}]*!r\}D\b"
)


def test_no_raw_repr_float_sql_idioms():
    hits = []
    for py in sorted(PKG.rglob("*.py")):
        text = py.read_text()
        for m in _FORBIDDEN.finditer(text):
            line = text[: m.start()].count("\n") + 1
            hits.append(f"{py.relative_to(PKG.parent)}:{line}: {m.group(0)}")
    assert not hits, (
        "raw repr-float SQL embedding found — route through lit_double():\n"
        + "\n".join(hits)
    )
