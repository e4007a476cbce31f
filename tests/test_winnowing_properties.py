"""Property tests for the winnowing fingerprint kernel (t_winnowing_fp):
the Schleimer-Wilkerson-Aiken detection guarantee, replicated in pure
Python against the same spec the Spark HOFs and the DuckDB oracle encode —
any shared substring of length >= k + w - 1 must produce at least one
shared fingerprint between two documents."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

M = 2147483647
K = 8  # gram length (chars) — mirrors queries_text._WIN_K
W = 16  # winnowing window (grams) — mirrors queries_text._WIN_W
GUARANTEE = K + W - 1  # any shared substring this long must be detected


def _grams(text: str) -> list[int]:
    out = []
    for i in range(len(text) - K + 1):
        a = 7
        for ch in text[i : i + K]:
            a = (a * 31 + ord(ch)) % M
        out.append(a)
    return out


def _fingerprints(text: str) -> set[int]:
    g = _grams(text)
    if not g:
        return set()
    if len(g) < W:
        return {min(g)}
    return {min(g[j : j + W]) for j in range(len(g) - W + 1)}


_WORD = st.text(alphabet="abcdefgh ", min_size=1, max_size=12)


@settings(max_examples=60, deadline=None)
@given(
    shared=st.text(alphabet="abcdefghij xyz", min_size=GUARANTEE, max_size=120),
    pre_a=st.text(alphabet="klmnopq ", max_size=60),
    post_a=st.text(alphabet="rstuvw ", max_size=60),
    pre_b=st.text(alphabet="KLMNOPQ ", max_size=60),
    post_b=st.text(alphabet="RSTUVW ", max_size=60),
)
def test_shared_substring_guarantee(shared, pre_a, post_a, pre_b, post_b):
    """Two docs embedding the same >= k+w-1-char substring at DIFFERENT
    offsets always share a fingerprint — the guarantee MinHash lacks."""
    a = pre_a + shared + post_a
    b = pre_b + shared + post_b
    fa, fb = _fingerprints(a), _fingerprints(b)
    assert fa & fb, (a, b)


@settings(max_examples=60, deadline=None)
@given(text=st.text(alphabet="abcdef gh", max_size=200))
def test_fingerprints_are_subset_of_gram_hashes(text):
    """Every fingerprint is the hash of some real gram of the document —
    winnowing selects, it never invents."""
    fps = _fingerprints(text)
    assert fps <= set(_grams(text)) or (not fps and len(text) < K)


@settings(max_examples=40, deadline=None)
@given(text=st.text(alphabet="abcdefgh ", min_size=K + W, max_size=200))
def test_fingerprint_density_bound(text):
    """At most one fingerprint per window position and at least one per
    w consecutive windows: 1 <= |fps| <= n_windows."""
    g = _grams(text)
    fps = _fingerprints(text)
    assert 1 <= len(fps) <= len(g) - W + 1


def test_python_spec_matches_engine_kernel(spark):
    """The pure-Python replica above IS the engine spec: run the engine's
    fingerprint island (r15: the numpy rolling-lattice rewrite of the HOF
    chain) on a hand-built frame and compare fingerprint sets."""
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.plans.queries_text import (
        _WIN_K,
        _WIN_W,
        _winnow_fps_df,
    )

    assert (_WIN_K, _WIN_W) == (K, W)
    texts = [
        "the common boilerplate header appears here verbatim",
        "something else entirely, but the common boilerplate header appears here verbatim too",
        "short",
        "",
        "x" * (K + W),  # repeated chars: one distinct gram, one fingerprint
        "y" * (K - 1),  # just under the gram length: empty fingerprint set
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r.doc_id: set(r.fps) for r in _winnow_fps_df(spark, df).collect()}
    for i, t in enumerate(texts):
        assert got[i] == _fingerprints(t), (i, t)
    # and the two boilerplate-sharing docs do share a fingerprint
    assert got[0] & got[1]
