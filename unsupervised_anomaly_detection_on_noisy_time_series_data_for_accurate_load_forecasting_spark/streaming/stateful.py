"""Custom stateful streaming operator: per-series online anomaly state via
``applyInPandasWithState`` (SURVEY.md §2.10 — the 'custom stateful operator'
extension slot).

Spec (cross-engine exact): events are consumed per series in event_id order.
Each value is quantized to the 1e-3 lattice with the *identical double
expression* in every engine:

    q = floor(value · 1000 + 0.5)

State is the pair of **exact integer prefix moments** (Σq, Σq²) plus the
count — associative, no float drift, so the streaming result equals the
batch SQL over ``ROWS UNBOUNDED PRECEDING AND 1 PRECEDING`` bit-for-bit
(the DuckDB oracle for stream_online_flags is exactly that window program).
An event is flagged iff

    n ≥ 30,  var > 0,  |q − μ| > 3·σ,
    μ = double(Σq)/n,  var = (double(Σq²) − double(Σq)²/n)/(n−1)

computed in doubles *of the exact integers* — deterministic at any
partitioning, any micro-batch boundaries, any scale.

Execution: the whole micro-batch group is processed **vectorized** (int64
cumsums + one boolean mask — no per-row Python), with an arbitrary-precision
fallback when the int64 prefix could overflow (|q|²·batch > 2^62). State
accumulators are stored as strings: unbounded-precision integers survive any
stream length; state stays O(1) per series.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

WARMUP = 30
Z_THRESHOLD = 3.0

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
        T.StructField("s1", T.StringType()),  # exact Σq as decimal text
        T.StructField("s2", T.StringType()),  # exact Σq² as decimal text
    ]
)


def _online_flags(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n0, s1_0, s2_0 = (state.get if state.exists else (0, "0", "0"))
    s1_0, s2_0 = int(s1_0), int(s2_0)

    # One sort over the whole group-batch: chunk arrival order is not a
    # contract, event_id order is.
    pdf = pd.concat(list(pdfs), ignore_index=True)
    pdf = pdf.sort_values("event_id").reset_index(drop=True)
    v = pdf["value"].to_numpy(dtype=np.float64)
    q = np.floor(v * 1000.0 + 0.5).astype(np.int64)

    # Overflow guard computed entirely in Python ints: q*q in int64 would
    # itself wrap for |q| > ~3.03e9, so the bound must come from |q|.max(),
    # never from an int64 square. mq*mq*len < 2^62 (with s1_0/s2_0 folded in)
    # also guarantees every q*q and both int64 cumsums below stay exact.
    mq = int(np.abs(q).max()) if len(q) else 0
    if len(q) and (abs(int(s1_0)) + mq * len(q) < 2**62) and (
        int(s2_0) + mq * mq * len(q) < 2**62
    ):
        qq = q * q  # int64-exact: guard above bounds mq² · len
        s1_prev = s1_0 + (np.cumsum(q) - q)
        s2_prev = s2_0 + (np.cumsum(qq) - qq)
        s1f, s2f = s1_prev.astype(np.float64), s2_prev.astype(np.float64)
        s1_end, s2_end = s1_0 + int(q.sum()), s2_0 + int(qq.sum())
    else:  # arbitrary-precision prefix (object cumsum), exact at any scale
        acc1, acc2 = s1_0, s2_0
        s1f = np.empty(len(q))
        s2f = np.empty(len(q))
        for i in range(len(q)):
            qi = int(q[i])
            s1f[i], s2f[i] = float(acc1), float(acc2)
            acc1 += qi
            acc2 += qi * qi
        s1_end, s2_end = acc1, acc2

    n_prev = n0 + np.arange(len(q), dtype=np.int64)
    with np.errstate(invalid="ignore", divide="ignore"):
        nf = n_prev.astype(np.float64)
        mean = s1f / nf
        var = (s2f - s1f * s1f / nf) / (nf - 1.0)
        z = (q.astype(np.float64) - mean) / np.sqrt(var)
    flag = (n_prev >= WARMUP) & (var > 0) & (np.abs(z) > Z_THRESHOLD)

    state.update((int(n0 + len(q)), str(s1_end), str(s2_end)))
    if flag.any():
        yield pd.DataFrame(
            {
                "user_id": np.full(int(flag.sum()), key[0], dtype=np.int64),
                "event_id": pdf["event_id"].to_numpy()[flag],
                "value": v[flag],
                "z": z[flag],
                "n_seen": n_prev[flag],
            }
        )


def online_zscore_flags(stream: DataFrame) -> DataFrame:
    """Apply the exact-moment state machine per user over the event stream."""
    return (
        stream.select("user_id", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _online_flags,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- streaming KMV (theta) distinct sketch ---------------------------------

STREAM_THETA_SALT = 131
STREAM_THETA_K = 64

THETA_OUT_SCHEMA = T.StructType(
    [
        T.StructField("window_start", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_sketch", T.LongType()),
        T.StructField("n_est", T.DoubleType()),
    ]
)

THETA_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("hashes", T.ArrayType(T.LongType())),
    ]
)


def _theta_users(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-day KMV state fold: keep the K smallest distinct scrambled user
    hashes ever seen in the window. The k-smallest set of a union is the
    k-smallest of the merged k-smallest sets (the KMV merge property), so
    the FINAL state is identical under any micro-batch slicing — the
    bounded-state streaming analog of approx_count_distinct, but with a
    deterministic, SQL-replayable estimate."""
    from ..functions.rng import M, rng_draw_np
    from ..operators.corpus import THETA_K  # noqa: F401 (doc cross-link)

    n0, hs0 = (state.get if state.exists else (0, []))
    hs = set(int(h) for h in hs0)
    n = int(n0)
    for pdf in pdfs:
        if len(pdf):
            draws = rng_draw_np([pdf["user_id"].to_numpy(dtype=np.int64)], salt=STREAM_THETA_SALT)
            hs.update(int(x) for x in draws)
            n += len(pdf)
    kept = sorted(hs)[:STREAM_THETA_K]
    state.update((n, kept))
    c = len(kept)
    if c < STREAM_THETA_K:
        est = float(c)
    else:
        est = float((STREAM_THETA_K - 1) * M) / float(kept[-1])
    yield pd.DataFrame(
        [
            {
                "window_start": key[0],
                "n_events": n,
                "n_sketch": c,
                "n_est": est,
            }
        ]
    )


def stream_theta_users(events: DataFrame) -> DataFrame:
    """Windowed approximate-distinct users over the event stream: tumbling
    1-day windows, each holding a KMV sketch of ≤ K user hashes — state is
    O(K) per window regardless of cardinality (collect_set would grow with
    distinct users; HLL via approx_count_distinct is not cross-engine
    replayable). Emissions are per-(batch, window); the complete row per
    window is the one with the final (maximal) n_events — selected by the
    caller with one combinable struct-max."""
    from pyspark.sql import functions as F

    keyed = events.withColumn(
        "window_start", F.date_trunc("day", F.col("ts"))
    ).select("window_start", "user_id")
    return keyed.groupBy("window_start").applyInPandasWithState(
        _theta_users,
        outputStructType=THETA_OUT_SCHEMA,
        stateStructType=THETA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- streaming EWMA control chart -------------------------------------------

EWMA_WARMUP = 30  # alerts need >= this many PRIOR observations

EWMA_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("ewma_q", T.LongType()),
        T.StructField("n_alerts", T.LongType()),
    ]
)

EWMA_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("e", T.LongType()),  # fixed-point EWMA (1e-3 lattice)
        T.StructField("s1", T.StringType()),  # exact Σq as decimal text
        T.StructField("s2", T.StringType()),  # exact Σq² as decimal text
        T.StructField("alerts", T.LongType()),
    ]
)


def _ewma_control(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user EWMA control chart (Roberts 1959) on the 1e-3 lattice.

    The smoothing step is the W3 integer fold (e' = ⌊(2q + 8e)/10⌋, α = 0.2,
    floor division — Python // floors exactly like the engines'
    pmod-reduced div), and the control limit is the classic
    L·σ·sqrt(α/(2−α)) with L = 3: for α = 0.2 the factor is exactly 1/3,
    so the alert test collapses to |e − μ| > σ — no float constant enters
    the comparison. μ/σ come from the exact integer prefix moments of the
    STRICTLY PRECEDING values (the online_zscore_flags convention), so the
    whole fold is a function of (event_id-ordered values) — deterministic
    at any partitioning and replayable by a recursive CTE."""
    n0, e0, s1_0, s2_0, a0 = (
        state.get if state.exists else (0, 0, "0", "0", 0)
    )
    n, e, s1, s2, alerts = int(n0), int(e0), int(s1_0), int(s2_0), int(a0)

    pdf = pd.concat(list(pdfs), ignore_index=True)
    pdf = pdf.sort_values("event_id").reset_index(drop=True)
    v = pdf["value"].to_numpy(dtype=np.float64)
    qs = np.floor(v * 1000.0 + 0.5).astype(np.int64)

    for q in qs:
        q = int(q)
        if n == 0:
            e = q
        else:
            # Python // floors for negatives too — identical to the engines'
            # pmod-reduced floor division
            e = (2 * q + 8 * e) // 10
            if n >= EWMA_WARMUP:
                var = (float(s2) - float(s1) * float(s1) / float(n)) / float(n - 1)
                if var > 0.0 and abs(float(e) - float(s1) / float(n)) > var ** 0.5:
                    alerts += 1
        s1 += q
        s2 += q * q
        n += 1

    state.update((n, e, str(s1), str(s2), alerts))
    yield pd.DataFrame(
        [
            {
                "user_id": int(key[0]),
                "n_events": n,
                "ewma_q": e,
                "n_alerts": alerts,
            }
        ]
    )


def stream_ewma_control(stream: DataFrame) -> DataFrame:
    """Per-user streaming EWMA control chart over the event stream: state is
    five scalars per user (count, fixed-point EWMA, two exact prefix
    moments, alert count) — O(1) regardless of stream length."""
    return (
        stream.select("user_id", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _ewma_control,
            outputStructType=EWMA_OUT_SCHEMA,
            stateStructType=EWMA_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


GAP_THRESHOLD_US = 3 * 3600 * 1_000_000  # an inter-event gap > 3 h is a hole

GAP_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_gaps", T.LongType()),
        T.StructField("max_gap_s", T.LongType()),
    ]
)

GAP_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n_gaps", T.LongType()),
        T.StructField("max_gap_us", T.LongType()),
    ]
)


def _gap_monitor(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user feed-health fold: inter-event time between CONSECUTIVE
    events in event_id order (the arrival-order contract every stateful
    operator here shares — within-batch sort + carried state makes the
    whole trajectory a function of the ordered stream, independent of
    micro-batch slicing). Gaps are exact integer µs differences; a gap
    above GAP_THRESHOLD_US counts as a feed hole. O(1) state: (count,
    last timestamp, hole count, max gap)."""
    n0, last0, g0, mx0 = state.get if state.exists else (0, -1, 0, 0)
    n, last, gaps, mx = int(n0), int(last0), int(g0), int(mx0)

    pdf = pd.concat(list(pdfs), ignore_index=True)
    pdf = pdf.sort_values("event_id").reset_index(drop=True)
    # Spark timestamps are µs-precision; force the µs unit explicitly (the
    # pandas default unit has varied ns/µs across versions — ns→µs is exact
    # here, and int64 µs is the exact integer the oracle's epoch_us sees)
    ts_us = pdf["ts"].astype("datetime64[us]").astype("int64").to_numpy()
    for t in ts_us:
        t = int(t)
        if n > 0:
            gap = t - last
            if gap > mx:
                mx = gap
            if gap > GAP_THRESHOLD_US:
                gaps += 1
        last = t
        n += 1

    state.update((n, last, gaps, mx))
    yield pd.DataFrame(
        [
            {
                "user_id": int(key[0]),
                "n_events": n,
                "n_gaps": gaps,
                "max_gap_s": mx // 1_000_000,
            }
        ]
    )


def stream_gap_monitor(stream: DataFrame) -> DataFrame:
    """Per-user streaming feed-health monitor: counts inter-event gaps above
    the 3 h threshold and tracks the maximum gap — the live twin of the
    batch w_gap_histogram (which profiles the hourly spine; this watches
    the raw arrival stream before any regularization exists). O(1) state
    per user."""
    return (
        stream.select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _gap_monitor,
            outputStructType=GAP_OUT_SCHEMA,
            stateStructType=GAP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
