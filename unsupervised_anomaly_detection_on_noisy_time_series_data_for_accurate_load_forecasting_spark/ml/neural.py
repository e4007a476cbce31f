"""Torch-backed models (import-gated — torch is absent in this container).

Reference models these mirror (citations into /root/reference/):
- M17 bi-LSTM denoising autoencoder   src/anomaly_imputation/autoencoder.py:7-167
- M20 seq2seq GRU forecaster          src/forecasting/seq2seq/model.py:6-59
- M21 SCINet forecaster               src/forecasting/SCINet/SCINet.py:10-430

Training is driver-side (collected anomaly-free windows fit comfortably —
the window set is ≪ the raw corpus); inference distributes via mapInPandas
with broadcast weights, exactly like ml/softpatch.py's embedding island.

These torch classes are the *accelerated* plug-point only. The ACTIVE
implementations are the pure-numpy trained models in ml/neural_np.py
(DenoisingAE, GRUSeq2Seq, SCINetNP) — deterministic analytic-gradient
training that runs in this container and is oracle-verified
(plans/queries_neural.py). Without torch, constructors here raise and
point at those.
"""

from __future__ import annotations

try:
    import torch
    from torch import nn

    HAS_TORCH = True
except ImportError:  # pragma: no cover - torch absent in the target container
    torch = None
    nn = None
    HAS_TORCH = False


def _require_torch(what: str) -> None:
    if not HAS_TORCH:
        raise NotImplementedError(
            f"{what} requires torch, which is not installed in this environment. "
            "Use the trained pure-numpy implementations in ml/neural_np.py "
            "(DenoisingAE / GRUSeq2Seq / SCINetNP) — same contracts, no torch — "
            "or install torch to enable these accelerated slots."
        )


class LSTMAutoencoder:
    """M17: bi-LSTM encoder (mean-pooled states) → repeat → bi-LSTM decoder →
    FC; MSE on the full sequence; Adam lr 1e-3, grad-clip 0.05, early stop."""

    def __init__(self, seq_len: int = 24, hidden: int = 32):
        _require_torch("LSTMAutoencoder (M17)")
        self.seq_len, self.hidden = seq_len, hidden
        enc = nn.LSTM(1, hidden, bidirectional=True, batch_first=True)
        dec = nn.LSTM(2 * hidden, hidden, bidirectional=True, batch_first=True)
        self.model = nn.ModuleDict(
            {"enc": enc, "dec": dec, "fc": nn.Linear(2 * hidden, 1)}
        )

    def fit(self, windows, epochs: int = 50):  # pragma: no cover - needs torch
        raise NotImplementedError("driver-side training loop; requires torch")


class Seq2SeqGRU:
    """M20: GRU encoder; decoder feeds back its own output for the horizon."""

    def __init__(self, n_in: int = 24, n_out: int = 24, hidden: int = 64):
        _require_torch("Seq2SeqGRU (M20)")
        self.n_in, self.n_out, self.hidden = n_in, n_out, hidden


class SCINet:
    """M21: recursive even/odd split + conv interaction tree (2 stacks)."""

    def __init__(self, n_in: int = 24, n_out: int = 24):
        _require_torch("SCINet (M21)")
        self.n_in, self.n_out = n_in, n_out
