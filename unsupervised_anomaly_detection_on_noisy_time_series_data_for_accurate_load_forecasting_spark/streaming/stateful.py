"""Custom stateful streaming operator: per-series online anomaly state via
``applyInPandasWithState`` (SURVEY.md §2.10 — the 'custom stateful operator'
extension slot).

Keeps (count, mean, M2) Welford state per series across micro-batches and
emits, per batch, the events whose |z| against the *state so far* exceeds the
threshold — the streaming analog of W6 with training-free, incrementally
learned statistics. State is O(3 doubles) per series: bounded regardless of
stream length.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("z", T.DoubleType()),
        T.StructField("n_seen", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("mean", T.DoubleType()),
        T.StructField("m2", T.DoubleType()),
    ]
)


def _welford_flags(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
    out_rows = []
    for pdf in pdfs:
        pdf = pdf.sort_values("event_id")
        for _, row in pdf.iterrows():
            x = float(row["value"])
            if n >= 30 and m2 > 0:
                std = (m2 / (n - 1)) ** 0.5
                z = (x - mean) / std if std > 0 else 0.0
                if abs(z) > 3.0:
                    out_rows.append((key[0], int(row["event_id"]), x, z, n))
            n += 1
            d = x - mean
            mean += d / n
            m2 += d * (x - mean)
    state.update((n, mean, m2))
    if out_rows:
        yield pd.DataFrame(out_rows, columns=[f.name for f in OUT_SCHEMA.fields])


def online_zscore_flags(stream: DataFrame) -> DataFrame:
    """Apply the Welford state machine per user over the event stream."""
    return (
        stream.select("user_id", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _welford_flags,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
