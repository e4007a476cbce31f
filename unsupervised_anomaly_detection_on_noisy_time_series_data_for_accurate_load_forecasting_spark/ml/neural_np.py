"""Trained neural models in pure numpy — the M17/M20/M21 model slots, real.

torch is absent in this environment, so the models are implemented directly:
forward passes, analytic backprop, Adam, gradient clipping, early stopping —
all deterministic (seeded init, fixed full-batch order, no dropout at train
time), so the Spark query and its DuckDB/numpy oracle mirror produce
bit-identical results.

Reference contracts these mirror (citations into /root/reference/):
- M17 denoising autoencoder   src/anomaly_imputation/autoencoder.py:107-167
  (input = masked sequence, target = clean sequence, full-sequence MSE,
   Adam, grad-clip, early stop with best-checkpoint restore;
   splice per autoencoder.py:187-199 — model output replaces hidden points
   only). Cell matches the reference's shape AND gating: bidirectional
   LSTM encoder → mean-over-time latent → latent repeated into a
   bidirectional LSTM decoder → linear head (LSTM step/backstep beside the
   shared GRU machinery, both numerically verified).
- M20 seq2seq GRU             src/forecasting/seq2seq/model.py:6-59,
  wrapper.py:12-135 — torch-convention GRU encoder; decoder GRU seeded with
  the encoder state, fc→relu→out head, feeding its own output back for the
  horizon; MSE, Adam.
- M21 SCINet                  src/forecasting/SCINet/SCINet.py:10-430 —
  recursive even/odd split; per node, four conv stacks (φ, ψ, P, U: reppad →
  conv k=5 → LeakyReLU → conv k=3 → tanh); modified interaction
  d = odd·exp(φ(even)), c = even·exp(ψ(odd)), even' = c + U(d),
  odd' = d − P(c); zip-up interleave; residual; then the time-axis
  projection Conv1d(input_len→output_len, k=1, no bias). Trained end-to-end
  (``fit_bp``): analytic backprop through the full conv interaction tree
  (reppad/conv/LeakyReLU/tanh modules, exp-mul couplings, zip recursion),
  gradients verified numerically. The closed-form ridge solve (``fit``) is
  the warm start for the projection and competes as a validation checkpoint,
  so training falls back to exactly the ridge model when no Adam epoch
  beats it — everything stays deterministic.

Scale shape: models are O(1)-size; training consumes a driver-side sample of
windows (callers bound it exactly like the softpatch candidate cap), and
inference ships broadcast weights into mapInPandas islands.
"""

from __future__ import annotations

import contextlib
import ctypes
import glob
import os

import numpy as np

__all__ = ["DenoisingAE", "GRUSeq2Seq", "SCINetNP"]


def _openblas_handle():
    """The OpenBLAS shared object numpy loaded, or None. Cached."""
    global _OPENBLAS
    if _OPENBLAS is not False:
        return _OPENBLAS
    _OPENBLAS = None
    libdir = os.path.join(os.path.dirname(os.path.dirname(np.__file__)), "numpy.libs")
    for f in glob.glob(os.path.join(libdir, "*openblas*")):
        try:
            h = ctypes.CDLL(f)
        except OSError:
            continue
        for suffix in ("64_", "", "_64"):
            if hasattr(h, f"openblas_set_num_threads{suffix}"):
                _OPENBLAS = (
                    getattr(h, f"openblas_get_num_threads{suffix}"),
                    getattr(h, f"openblas_set_num_threads{suffix}"),
                )
                return _OPENBLAS
    return _OPENBLAS


_OPENBLAS: object = False


@contextlib.contextmanager
def _blas_single_thread():
    """Pin the in-process OpenBLAS pool to one thread for the duration.

    The recurrent fits run hundreds of tiny GEMMs per epoch; OpenBLAS's
    default all-core pool spends more time spinning than computing on those
    shapes (3× wall measured on local[32]), and a fixed thread count also
    pins the GEMM reduction order, so driver fit and mirror fit stay
    bit-identical regardless of machine core count. No-op when OpenBLAS
    isn't the loaded backend."""
    h = _openblas_handle()
    if h is None:
        yield
        return
    get_n, set_n = h
    prev = get_n()
    set_n(1)
    try:
        yield
    finally:
        set_n(prev)


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def _clip_global(grads: dict[str, np.ndarray], max_norm: float) -> None:
    """torch-convention global-norm gradient clipping, in place."""
    total = np.sqrt(sum(float((g * g).sum()) for g in grads.values()))
    if total > max_norm:
        scale = max_norm / (total + 1e-12)
        for g in grads.values():
            g *= scale


class _Adam:
    def __init__(self, params: dict[str, np.ndarray], lr: float):
        self.lr = lr
        self.t = 0
        self.m = {k: np.zeros_like(v) for k, v in params.items()}
        self.v = {k: np.zeros_like(v) for k, v in params.items()}

    def step(self, params: dict[str, np.ndarray], grads: dict[str, np.ndarray]) -> None:
        self.t += 1
        b1, b2, eps = 0.9, 0.999, 1e-8
        bc1 = 1 - b1**self.t
        bc2 = 1 - b2**self.t
        for k, g in grads.items():
            self.m[k] = b1 * self.m[k] + (1 - b1) * g
            self.v[k] = b2 * self.v[k] + (1 - b2) * g * g
            params[k] -= self.lr * (self.m[k] / bc1) / (np.sqrt(self.v[k] / bc2) + eps)


def _glorot(rs: np.random.RandomState, fan_in: int, fan_out: int) -> np.ndarray:
    lim = np.sqrt(6.0 / (fan_in + fan_out))
    return rs.uniform(-lim, lim, (fan_out, fan_in))


def _val_split(n: int, val_frac: float) -> int:
    """Deterministic tail split (callers pass key-sorted windows)."""
    return max(1, int(round(n * (1 - val_frac)))) if n > 1 else n


class DenoisingAE:
    """M17: recurrent denoising autoencoder, the reference's cell shape AND
    gating (src/anomaly_imputation/autoencoder.py:7-58): bidirectional LSTM
    encoder over the masked sequence, latent = mean of the encoder outputs
    over time (``torch.mean(x, dim=1)``), latent repeated seq_len times into
    a bidirectional LSTM decoder (hidden = 2·embed, as the reference's
    ``Decoder.hidden_size = 2 * no_features``), linear head to the scalar
    channel. The LSTM step/backstep live beside the shared GRU machinery and
    are numerically verified the same way (tests/test_neural_np.py)."""

    def __init__(self, seq_len: int = 24, embed: int = 8, seed: int = 0):
        rs = np.random.RandomState(seed)
        self.seq_len, self.embed = seq_len, embed
        dec_h = 2 * embed
        self.p: dict[str, np.ndarray] = {}
        for pre, d, h in (
            ("ef_", 1, embed),
            ("eb_", 1, embed),
            ("df_", 2 * embed, dec_h),
            ("db_", 2 * embed, dec_h),
        ):
            for k, v in _lstm_init(rs, d, h).items():
                self.p[pre + k] = v
        self.p["Wf"] = _glorot(rs, 2 * dec_h, 1)
        self.p["bf"] = np.zeros(1)
        self.mu, self.sd = 0.0, 1.0  # affine input scale, learned at fit
        self.fitted = False

    def _forward(self, X: np.ndarray, want_cache: bool = False):
        """X: (n, L) masked input → (n, L) reconstruction.

        Bidirectional runs share one loop body: the backward direction
        processes positions L-1..0; its output for position t is the state
        after step s = L-1-t."""
        n, L = X.shape
        E, D = self.embed, 2 * self.embed
        p = self.p
        # input-side projections hoisted out of the recurrence: the encoder
        # input is a scalar (one broadcast multiply covers all steps), the
        # decoder input is step-constant (one matmul per direction)
        gi_ef = X[:, :, None] * p["ef_Wi"][None, None, :, 0] + p["ef_bi"]  # (n, L, 4E)
        gi_eb = X[:, :, None] * p["eb_Wi"][None, None, :, 0] + p["eb_bi"]
        hf, hb = np.zeros((n, E)), np.zeros((n, E))
        cf, cb = np.zeros((n, E)), np.zeros((n, E))
        ef_h, eb_h, ef_c, eb_c = [], [], [], []
        for t in range(L):
            hf, cf, c = _lstm_step(p, "ef_", X[:, t : t + 1], hf, cf, gi=gi_ef[:, t])
            ef_h.append(hf)
            ef_c.append(c)
            s = L - 1 - t
            hb, cb, c = _lstm_step(p, "eb_", X[:, s : s + 1], hb, cb, gi=gi_eb[:, s])
            eb_h.append(hb)
            eb_c.append(c)
        # latent: mean over positions of concat(fw_t, bw_t); the concat
        # commutes with the mean, so each direction is averaged separately
        lat = np.concatenate(
            [np.mean(ef_h, axis=0), np.mean(eb_h, axis=0)], axis=1
        )  # (n, 2E)
        gi_df = lat @ p["df_Wi"].T + p["df_bi"]  # step-constant, (n, 4D)
        gi_db = lat @ p["db_Wi"].T + p["db_bi"]
        gf, gb = np.zeros((n, D)), np.zeros((n, D))
        sf, sb = np.zeros((n, D)), np.zeros((n, D))
        df_h, db_h, df_c, db_c = [], [], [], []
        for t in range(L):
            gf, sf, c = _lstm_step(p, "df_", lat, gf, sf, gi=gi_df)
            df_h.append(gf)
            df_c.append(c)
            gb, sb, c = _lstm_step(p, "db_", lat, gb, sb, gi=gi_db)
            db_h.append(gb)
            db_c.append(c)
        # head over all positions in one matmul: out[t] pairs the forward
        # state at t with the backward state for position t (= step L-1-t)
        fw = np.stack(df_h, axis=1)  # (n, L, D)
        bw = np.stack(db_h[::-1], axis=1)
        cats = np.concatenate([fw, bw], axis=2)  # (n, L, 2D)
        out = cats.reshape(n * L, 2 * D) @ p["Wf"].T
        out = out.reshape(n, L) + p["bf"][0]
        if want_cache:
            return out, (ef_c, eb_c, df_c, db_c, cats, lat)
        return out

    def predict(self, X: np.ndarray, mask: np.ndarray | None = None) -> np.ndarray:
        """Reconstruct. The model operates in normalized space (the reference
        pipeline min-max-normalizes before the AE; here an affine z-scale
        learned at fit time, carried in the weights): observed points are
        z-scaled, masked points become the 0.0 missing token *after* scaling
        — exactly the train-time view — and the output is de-scaled."""
        X = np.asarray(X, dtype=np.float64)
        one = X.ndim == 1
        Xn = (np.atleast_2d(X) - self.mu) / self.sd
        if mask is not None:
            Xn = np.where(np.atleast_2d(np.asarray(mask)) == 1, 0.0, Xn)
        # single-thread BLAS: predict also runs inside executor pandas-UDF
        # workers, where 32 tasks × an all-core BLAS pool would thrash
        with _blas_single_thread():
            out = self._forward(Xn) * self.sd + self.mu
        return out[0] if one else out

    def _grads(self, X: np.ndarray, Y: np.ndarray):
        """Full BPTT through head → both decoder directions → latent mean →
        both encoder directions. Returns (loss, grads)."""
        n, L = X.shape
        E, D = self.embed, 2 * self.embed
        p = self.p
        out, (ef_c, eb_c, df_c, db_c, cats, lat) = self._forward(X, want_cache=True)
        err = out - Y
        loss = float((err * err).mean())
        d_out = 2.0 * err / err.size  # (n, L)
        g = {k: np.zeros_like(v) for k, v in p.items()}
        # head grads in one matmul over all positions
        do_flat = d_out.reshape(n * L, 1)
        g["Wf"] = do_flat.T @ cats.reshape(n * L, 2 * D)
        g["bf"][0] = do_flat.sum()
        dcats = (do_flat @ p["Wf"]).reshape(n, L, 2 * D)
        # grads wrt decoder states by PROCESSING step: fw step t is position
        # t; bw step s is position L-1-s
        d_df = dcats[:, :, :D]
        d_db = dcats[:, ::-1, D:]
        # decoder BPTT. LSTM pre-activations enter additively from both
        # sides, so one ds per step serves Wi, Wh, bi, bh; weight grads
        # batch across steps after the loop (the input is step-constant:
        # Σ_t ds_t.T @ x_t = (Σ ds).T @ lat).
        carry_f, carry_fc = np.zeros((n, D)), np.zeros((n, D))
        carry_b, carry_bc = np.zeros((n, D)), np.zeros((n, D))
        ds_f_sum = np.zeros((n, 4 * D))
        ds_b_sum = np.zeros((n, 4 * D))
        ds_f, ds_b = [None] * L, [None] * L
        for t in range(L - 1, -1, -1):
            ds, carry_f, carry_fc = _lstm_back_parts(
                p, "df_", d_df[:, t] + carry_f, carry_fc, df_c[t]
            )
            ds_f_sum += ds
            ds_f[t] = ds
            ds, carry_b, carry_bc = _lstm_back_parts(
                p, "db_", d_db[:, t] + carry_b, carry_bc, db_c[t]
            )
            ds_b_sum += ds
            ds_b[t] = ds
        for pre, ds_sum, ds_l, caches in (
            ("df_", ds_f_sum, ds_f, df_c),
            ("db_", ds_b_sum, ds_b, db_c),
        ):
            g[pre + "Wi"] = ds_sum.T @ lat
            g[pre + "bi"] = ds_sum.sum(axis=0)
            ds_all = np.concatenate(ds_l, axis=0)  # (L·n, 4D)
            h_all = np.concatenate([c[1] for c in caches], axis=0)
            g[pre + "Wh"] = ds_all.T @ h_all
            g[pre + "bh"] = ds_all.sum(axis=0)
        d_lat = ds_f_sum @ p["df_Wi"] + ds_b_sum @ p["db_Wi"]
        # encoder BPTT: each position contributes 1/L of the latent mean;
        # dx is never needed (inputs are data), so only ds is kept
        d_ef = d_lat[:, :E] / L
        d_eb = d_lat[:, E:] / L
        carry_f, carry_fc = np.zeros((n, E)), np.zeros((n, E))
        carry_b, carry_bc = np.zeros((n, E)), np.zeros((n, E))
        ds_ef, ds_eb = [None] * L, [None] * L
        for t in range(L - 1, -1, -1):
            ds, carry_f, carry_fc = _lstm_back_parts(
                p, "ef_", d_ef + carry_f, carry_fc, ef_c[t]
            )
            ds_ef[t] = ds
            ds, carry_b, carry_bc = _lstm_back_parts(
                p, "eb_", d_eb + carry_b, carry_bc, eb_c[t]
            )
            ds_eb[t] = ds
        for pre, ds_l, caches in (("ef_", ds_ef, ef_c), ("eb_", ds_eb, eb_c)):
            ds_all = np.concatenate(ds_l, axis=0)  # (L·n, 4E)
            x_all = np.concatenate([c[0] for c in caches], axis=0)  # (L·n, 1)
            h_all = np.concatenate([c[1] for c in caches], axis=0)
            g[pre + "Wi"] = ds_all.T @ x_all
            g[pre + "bi"] = ds_all.sum(axis=0)
            g[pre + "Wh"] = ds_all.T @ h_all
            g[pre + "bh"] = ds_all.sum(axis=0)
        return loss, g

    def fit(
        self,
        masked: np.ndarray,
        clean: np.ndarray,
        epochs: int = 300,
        lr: float = 5e-3,
        max_grad_norm: float = 1.0,
        patience: int = 20,
        val_frac: float = 0.2,
        mask: np.ndarray | None = None,
    ) -> list[float]:
        """Full-sequence MSE(clean, decode(masked)) — autoencoder.py:134-139's
        'option 1' loss; early stop on val loss with best-weight restore.
        Training happens in z-scaled space (deterministic affine from the
        clean targets, stored with the weights): the reference normalizes
        upstream of the AE, and a recurrent cell on raw hundreds-scale load
        values would saturate its gates. ``mask`` marks the hidden points so
        the 0.0 missing token lands *after* scaling; without it, points where
        masked != clean are treated as hidden."""
        Y = np.asarray(clean, dtype=np.float64)
        Xraw = np.asarray(masked, dtype=np.float64)
        m = np.asarray(mask) == 1 if mask is not None else Xraw != Y
        self.mu = float(Y.mean())
        self.sd = float(Y.std()) or 1.0
        Y = (Y - self.mu) / self.sd
        X = np.where(m, 0.0, Y)
        cut = _val_split(len(X), val_frac)
        Xtr, Ytr, Xva, Yva = X[:cut], Y[:cut], X[cut:], Y[cut:]
        if not len(Xva):
            Xva, Yva = Xtr, Ytr
        opt = _Adam(self.p, lr)
        best = (np.inf, {k: v.copy() for k, v in self.p.items()})
        bad, hist = 0, []
        with _blas_single_thread():
            for _ in range(epochs):
                loss, g = self._grads(Xtr, Ytr)
                hist.append(loss)
                _clip_global(g, max_grad_norm)
                opt.step(self.p, g)
                v_out = self._forward(Xva)
                v_loss = float(((v_out - Yva) ** 2).mean())
                if v_loss < best[0] - 1e-12:
                    best = (v_loss, {k: v.copy() for k, v in self.p.items()})
                    bad = 0
                else:
                    bad += 1
                    if bad >= patience:
                        break
        self.p = best[1]  # checkpoint restore, autoencoder.py:163-165
        self.fitted = True
        return hist

    def impute(self, ts: np.ndarray, mask: np.ndarray) -> np.ndarray:
        """M18 splice: model output replaces hidden points only
        (autoencoder.py:187-199; there mask==0 is hidden, here mask==1)."""
        out = self.predict(ts, mask)
        ts = np.asarray(ts, dtype=np.float64)
        return np.where(np.asarray(mask) == 1, out, ts)

    def weights(self) -> dict[str, np.ndarray]:
        w = {k: v.copy() for k, v in self.p.items()}
        w["_mu"] = np.array(self.mu)
        w["_sd"] = np.array(self.sd)
        return w

    @classmethod
    def from_weights(cls, w: dict[str, np.ndarray], seq_len: int = 24) -> "DenoisingAE":
        m = cls(seq_len=seq_len)
        m.p = {
            k: np.asarray(v, dtype=np.float64) for k, v in w.items() if not k.startswith("_")
        }
        m.mu = float(w["_mu"])
        m.sd = float(w["_sd"])
        m.embed = m.p["ef_Wh"].shape[1]
        m.fitted = True
        return m


def _gru_init(rs: np.random.RandomState, in_dim: int, h: int) -> dict[str, np.ndarray]:
    k = 1.0 / np.sqrt(h)
    return {
        "Wi": rs.uniform(-k, k, (3 * h, in_dim)),
        "Wh": rs.uniform(-k, k, (3 * h, h)),
        "bi": np.zeros(3 * h),
        "bh": np.zeros(3 * h),
    }


def _gru_step(p: dict, prefix: str, x: np.ndarray, h: np.ndarray, gi: np.ndarray | None = None):
    """torch-convention GRU cell; returns (h', cache for backprop).
    ``gi`` lets callers pass the input-side projection precomputed (batched
    over timesteps, or hoisted when the input is step-constant)."""
    H = h.shape[1]
    if gi is None:
        gi = x @ p[prefix + "Wi"].T + p[prefix + "bi"]
    gh = h @ p[prefix + "Wh"].T + p[prefix + "bh"]
    r = _sigmoid(gi[:, :H] + gh[:, :H])
    z = _sigmoid(gi[:, H : 2 * H] + gh[:, H : 2 * H])
    q = gh[:, 2 * H :]  # h-side pre-activation of the candidate
    n = np.tanh(gi[:, 2 * H :] + r * q)
    h_new = (1 - z) * n + z * h
    return h_new, (x, h, r, z, n, q)


def _gru_back_parts(p: dict, prefix: str, dh_new: np.ndarray, cache):
    """One GRU step of backprop WITHOUT weight-grad accumulation: returns
    (dgi, dgh, dh_prev). Callers batch ``dgi.T @ x`` / ``dgh.T @ h`` across
    timesteps into single matmuls (the AE) or accumulate per step
    (_gru_back)."""
    x, h, r, z, n, q = cache
    dz = dh_new * (h - n)
    dn = dh_new * (1 - z)
    dh_prev = dh_new * z
    dn_pre = dn * (1 - n * n)
    dr = dn_pre * q
    dq = dn_pre * r
    dr_pre = dr * r * (1 - r)
    dz_pre = dz * z * (1 - z)
    dgi = np.concatenate([dr_pre, dz_pre, dn_pre], axis=1)
    dgh = np.concatenate([dr_pre, dz_pre, dq], axis=1)
    dh_prev = dh_prev + dgh @ p[prefix + "Wh"]
    return dgi, dgh, dh_prev


def _lstm_init(rs: np.random.RandomState, in_dim: int, h: int) -> dict[str, np.ndarray]:
    k = 1.0 / np.sqrt(h)
    return {
        "Wi": rs.uniform(-k, k, (4 * h, in_dim)),
        "Wh": rs.uniform(-k, k, (4 * h, h)),
        "bi": np.zeros(4 * h),
        "bh": np.zeros(4 * h),
    }


def _lstm_step(
    p: dict,
    prefix: str,
    x: np.ndarray,
    h: np.ndarray,
    c: np.ndarray,
    gi: np.ndarray | None = None,
):
    """torch-convention LSTM cell (gate order i|f|g|o); returns
    (h', c', cache). ``gi`` lets callers pass the input-side projection
    precomputed, exactly like _gru_step."""
    H = h.shape[1]
    if gi is None:
        gi = x @ p[prefix + "Wi"].T + p[prefix + "bi"]
    s = gi + h @ p[prefix + "Wh"].T + p[prefix + "bh"]
    i = _sigmoid(s[:, :H])
    f = _sigmoid(s[:, H : 2 * H])
    g_ = np.tanh(s[:, 2 * H : 3 * H])
    o = _sigmoid(s[:, 3 * H :])
    c_new = f * c + i * g_
    h_new = o * np.tanh(c_new)
    return h_new, c_new, (x, h, c, i, f, g_, o, c_new)


def _lstm_back_parts(p: dict, prefix: str, dh_new: np.ndarray, dc_in: np.ndarray, cache):
    """One LSTM step of backprop without weight-grad accumulation: returns
    (ds, dh_prev, dc_prev). The input- and hidden-side pre-activations enter
    additively, so dgi == dgh == ds — callers batch ``ds.T @ x`` and
    ``ds.T @ h`` across timesteps into single matmuls."""
    x, h, c_prev, i, f, g_, o, c_new = cache
    tc = np.tanh(c_new)
    do = dh_new * tc
    dc = dc_in + dh_new * o * (1.0 - tc * tc)
    di = dc * g_
    df = dc * c_prev
    dg = dc * i
    dc_prev = dc * f
    ds = np.concatenate(
        [di * i * (1 - i), df * f * (1 - f), dg * (1.0 - g_ * g_), do * o * (1 - o)],
        axis=1,
    )
    dh_prev = ds @ p[prefix + "Wh"]
    return ds, dh_prev, dc_prev


def _gru_back(p: dict, prefix: str, dh_new: np.ndarray, cache, g: dict):
    """Backprop one GRU step: returns (dx, dh_prev); accumulates into g."""
    x, h = cache[0], cache[1]
    dgi, dgh, dh_prev = _gru_back_parts(p, prefix, dh_new, cache)
    g[prefix + "Wi"] += dgi.T @ x
    g[prefix + "Wh"] += dgh.T @ h
    g[prefix + "bi"] += dgi.sum(axis=0)
    g[prefix + "bh"] += dgh.sum(axis=0)
    dx = dgi @ p[prefix + "Wi"]
    return dx, dh_prev


class GRUSeq2Seq:
    """M20: GRU encoder → GRU decoder (self-feedback) → fc → relu → out."""

    def __init__(self, n_in: int = 24, n_out: int = 24, hidden: int = 32, fc_units: int = 16, seed: int = 0):
        rs = np.random.RandomState(seed)
        self.n_in, self.n_out, self.h = n_in, n_out, hidden
        self.p = {}
        for pre, d in (("e_", 1), ("d_", 1)):
            for k, v in _gru_init(rs, d, hidden).items():
                self.p[pre + k] = v
        self.p["fcW"] = _glorot(rs, hidden, fc_units)
        self.p["fcb"] = np.zeros(fc_units)
        self.p["outW"] = _glorot(rs, fc_units, 1)
        self.p["outb"] = np.zeros(1)
        self.fitted = False

    def _forward(self, X: np.ndarray, want_cache: bool = False):
        """X: (B, n_in) → predictions (B, n_out)."""
        B = X.shape[0]
        h = np.zeros((B, self.h))
        enc_caches = []
        for t in range(X.shape[1]):
            h, c = _gru_step(self.p, "e_", X[:, t : t + 1], h)
            enc_caches.append(c)
        dec_in = X[:, -1:]
        dec_caches = []
        outs = np.empty((B, self.n_out))
        for t in range(self.n_out):
            h, c = _gru_step(self.p, "d_", dec_in, h)
            fc_pre = h @ self.p["fcW"].T + self.p["fcb"]
            fc = np.maximum(fc_pre, 0.0)
            o = fc @ self.p["outW"].T + self.p["outb"]
            dec_caches.append((c, h, fc_pre, fc))
            outs[:, t] = o[:, 0]
            dec_in = o
        if want_cache:
            return outs, (enc_caches, dec_caches)
        return outs

    def predict(self, X: np.ndarray) -> np.ndarray:
        # single-thread BLAS: also runs inside executor pandas-UDF workers
        with _blas_single_thread():
            return self._forward(np.asarray(X, dtype=np.float64))

    def _grads(self, X: np.ndarray, Y: np.ndarray):
        outs, (enc_caches, dec_caches) = self._forward(X, want_cache=True)
        err = outs - Y
        loss = float((err * err).mean())
        d_outs = 2.0 * err / err.size
        g = {k: np.zeros_like(v) for k, v in self.p.items()}
        dh = np.zeros((X.shape[0], self.h))
        dx_feedback = np.zeros((X.shape[0], 1))
        # reverse through the decoder: each output feeds the loss AND the
        # next step's input, so its gradient carries both terms.
        for t in range(self.n_out - 1, -1, -1):
            cache, h_t, fc_pre, fc = dec_caches[t]
            do = d_outs[:, t : t + 1] + (dx_feedback if t < self.n_out - 1 else 0.0)
            g["outW"] += do.T @ fc
            g["outb"] += do.sum(axis=0)
            dfc = (do @ self.p["outW"]) * (fc_pre > 0)
            g["fcW"] += dfc.T @ h_t
            g["fcb"] += dfc.sum(axis=0)
            dh_total = dh + dfc @ self.p["fcW"]
            dx, dh = _gru_back(self.p, "d_", dh_total, cache, g)
            dx_feedback = dx
        # dx of decoder step 0 flows to X[:, -1] (the primer input)
        dX_last = dx_feedback.copy()
        for t in range(self.n_in - 1, -1, -1):
            dx, dh = _gru_back(self.p, "e_", dh, enc_caches[t], g)
            if t == self.n_in - 1:
                dx = dx + dX_last
            # input gradients are not needed further
        return loss, g

    def fit(
        self,
        X: np.ndarray,
        Y: np.ndarray,
        epochs: int = 150,
        lr: float = 5e-3,
        max_grad_norm: float = 5.0,
        patience: int = 15,
        val_frac: float = 0.2,
    ) -> list[float]:
        X = np.asarray(X, dtype=np.float64)
        Y = np.asarray(Y, dtype=np.float64)
        cut = _val_split(len(X), val_frac)
        Xtr, Ytr, Xva, Yva = X[:cut], Y[:cut], X[cut:], Y[cut:]
        if not len(Xva):
            Xva, Yva = Xtr, Ytr
        opt = _Adam(self.p, lr)
        best = (np.inf, {k: v.copy() for k, v in self.p.items()})
        bad, hist = 0, []
        with _blas_single_thread():
            for _ in range(epochs):
                loss, g = self._grads(Xtr, Ytr)
                hist.append(loss)
                _clip_global(g, max_grad_norm)
                opt.step(self.p, g)
                v = self._forward(Xva)
                v_loss = float(((v - Yva) ** 2).mean())
                if v_loss < best[0] - 1e-12:
                    best = (v_loss, {k: v.copy() for k, v in self.p.items()})
                    bad = 0
                else:
                    bad += 1
                    if bad >= patience:
                        break
        self.p = best[1]
        self.fitted = True
        return hist

    def weights(self) -> dict[str, np.ndarray]:
        return {k: v.copy() for k, v in self.p.items()}

    @classmethod
    def from_weights(cls, w: dict[str, np.ndarray], n_in: int = 24, n_out: int = 24) -> "GRUSeq2Seq":
        m = cls(n_in=n_in, n_out=n_out)
        m.p = {k: np.asarray(v, dtype=np.float64) for k, v in w.items()}
        m.h = m.p["e_Wh"].shape[1]
        m.fitted = True
        return m


def _conv1d(x: np.ndarray, W: np.ndarray) -> np.ndarray:
    """Valid cross-correlation. x: (B, C_in, T), W: (C_out, C_in, k)."""
    k = W.shape[2]
    L = x.shape[2] - k + 1
    out = np.zeros((x.shape[0], W.shape[0], L))
    for j in range(k):
        out += np.einsum("oc,bct->bot", W[:, :, j], x[:, :, j : j + L])
    return out


def _conv1d_back(x: np.ndarray, W: np.ndarray, dout: np.ndarray):
    """Gradients of _conv1d: returns (dx, dW)."""
    k = W.shape[2]
    L = dout.shape[2]
    dx = np.zeros_like(x)
    dW = np.zeros_like(W)
    for j in range(k):
        dx[:, :, j : j + L] += np.einsum("oc,bot->bct", W[:, :, j], dout)
        dW[:, :, j] += np.einsum("bot,bct->oc", dout, x[:, :, j : j + L])
    return dx, dW


def _rep_pad(x: np.ndarray, pad: int) -> np.ndarray:
    """ReplicationPad1d on (B, C, T)."""
    left = np.repeat(x[:, :, :1], pad, axis=2)
    right = np.repeat(x[:, :, -1:], pad, axis=2)
    return np.concatenate([left, x, right], axis=2)


def _rep_pad_back(dpadded: np.ndarray, pad: int) -> np.ndarray:
    """Gradient of _rep_pad: edge gradients fold back onto the border cells."""
    d = dpadded[:, :, pad:-pad].copy()
    d[:, :, 0] += dpadded[:, :, :pad].sum(axis=2)
    d[:, :, -1] += dpadded[:, :, -pad:].sum(axis=2)
    return d


class SCINetNP:
    """M21: SCINet interaction tree, trained end-to-end.

    ``fit`` ridge-solves the readout over the frozen seeded tree (the fast
    warm start); ``fit_bp`` then trains the FULL tree — conv stacks, exp-mul
    couplings, readout — with analytic backprop through the reppad/conv/
    LeakyReLU/tanh modules and the even/odd zip recursion (gradients verified
    numerically in tests/test_neural_np.py). The A/B harness uses fit_bp
    with the ridge solution competing as a checkpoint."""

    def __init__(
        self,
        n_in: int = 24,
        n_out: int = 24,
        levels: int = 2,
        hidden: int = 4,
        kernel: int = 5,
        seed: int = 0,
        ridge: float = 1e-3,
    ):
        assert n_in % (2**levels) == 0, "input_len must divide 2^levels (SCINet.py:325)"
        self.n_in, self.n_out, self.levels, self.ridge = n_in, n_out, levels, ridge
        self.k1, self.k2, self.hidden = kernel, 3, hidden
        rs = np.random.RandomState(seed)
        self.nodes: dict[str, dict[str, np.ndarray]] = {}

        def make_node(path: str, level: int) -> None:
            node = {}
            for mod in ("phi", "psi", "P", "U"):
                node[mod + "_W1"] = rs.standard_normal((hidden, 1, self.k1)) * np.sqrt(2.0 / self.k1)
                node[mod + "_b1"] = np.zeros(hidden)
                node[mod + "_W2"] = rs.standard_normal((1, hidden, self.k2)) * np.sqrt(2.0 / (hidden * self.k2))
                node[mod + "_b2"] = np.zeros(1)
            self.nodes[path] = node
            if level > 0:
                make_node(path + "e", level - 1)
                make_node(path + "o", level - 1)

        make_node("r", levels - 1)
        self.proj = np.zeros((n_out, n_in))
        self.fitted = False

    def _module_fwd(self, node: dict, mod: str, x: np.ndarray):
        """x: (B, T) → (B, T): reppad → conv k1 → LeakyReLU → conv k2 → tanh.
        pad_l = pad_r = (k−1)//2 + 1 keeps length (SCINet.py:38-41)."""
        pad = (self.k1 - 1) // 2 + 1
        xp = _rep_pad(x[:, None, :], pad)
        pre1 = _conv1d(xp, node[mod + "_W1"]) + node[mod + "_b1"][None, :, None]
        act = np.where(pre1 > 0, pre1, 0.01 * pre1)
        pre2 = _conv1d(act, node[mod + "_W2"]) + node[mod + "_b2"][None, :, None]
        y = np.tanh(pre2)[:, 0, :]
        return y, (xp, pre1, act, y)

    def _module(self, node: dict, mod: str, x: np.ndarray) -> np.ndarray:
        return self._module_fwd(node, mod, x)[0]

    def _module_back(self, path: str, mod: str, cache, dy: np.ndarray, grads: dict) -> np.ndarray:
        """Backprop one conv module; accumulates into grads, returns dx."""
        node = self.nodes[path]
        xp, pre1, act, y = cache
        pad = (self.k1 - 1) // 2 + 1
        dpre2 = (dy * (1 - y * y))[:, None, :]
        dact, dW2 = _conv1d_back(act, node[mod + "_W2"], dpre2)
        dpre1 = dact * np.where(pre1 > 0, 1.0, 0.01)
        dxp, dW1 = _conv1d_back(xp, node[mod + "_W1"], dpre1)
        grads[path + "/" + mod + "_W2"] += dW2
        grads[path + "/" + mod + "_b2"] += dpre2.sum(axis=(0, 2))
        grads[path + "/" + mod + "_W1"] += dW1
        grads[path + "/" + mod + "_b1"] += dpre1.sum(axis=(0, 2))
        return _rep_pad_back(dxp, pad)[:, 0, :]

    def _tree_fwd(self, path: str, level: int, x: np.ndarray):
        node = self.nodes[path]
        even, odd = x[:, ::2], x[:, 1::2]
        phi_y, phi_c = self._module_fwd(node, "phi", even)
        exp_phi = np.exp(phi_y)
        d = odd * exp_phi
        psi_y, psi_c = self._module_fwd(node, "psi", odd)
        exp_psi = np.exp(psi_y)
        c = even * exp_psi
        U_y, U_c = self._module_fwd(node, "U", d)
        even_u = c + U_y
        P_y, P_c = self._module_fwd(node, "P", c)
        odd_u = d - P_y
        sub = None
        if level > 0:
            e_out, e_sub = self._tree_fwd(path + "e", level - 1, even_u)
            o_out, o_sub = self._tree_fwd(path + "o", level - 1, odd_u)
            sub = (e_sub, o_sub)
            even_u, odd_u = e_out, o_out
        # zip_up_the_pants (SCINet.py:166-178)
        out = np.empty((x.shape[0], even_u.shape[1] + odd_u.shape[1]))
        out[:, ::2] = even_u
        out[:, 1::2] = odd_u
        cache = dict(
            even=even, odd=odd, exp_phi=exp_phi, exp_psi=exp_psi, d=d, c=c,
            phi_c=phi_c, psi_c=psi_c, U_c=U_c, P_c=P_c, sub=sub,
        )
        return out, cache

    def _tree(self, path: str, level: int, x: np.ndarray) -> np.ndarray:
        return self._tree_fwd(path, level, x)[0]

    def _tree_back(self, path: str, level: int, cache: dict, dout: np.ndarray, grads: dict) -> np.ndarray:
        de_u = np.ascontiguousarray(dout[:, ::2])
        do_u = np.ascontiguousarray(dout[:, 1::2])
        if level > 0:
            e_sub, o_sub = cache["sub"]
            de_u = self._tree_back(path + "e", level - 1, e_sub, de_u, grads)
            do_u = self._tree_back(path + "o", level - 1, o_sub, do_u, grads)
        even, odd = cache["even"], cache["odd"]
        exp_phi, exp_psi = cache["exp_phi"], cache["exp_psi"]
        # odd_u = d − P(c);  even_u = c + U(d)
        dd = do_u.copy()
        dc = de_u + self._module_back(path, "P", cache["P_c"], -do_u, grads)
        dd += self._module_back(path, "U", cache["U_c"], de_u, grads)
        # c = even · exp(psi(odd))
        deven = dc * exp_psi
        dodd = self._module_back(path, "psi", cache["psi_c"], dc * even * exp_psi, grads)
        # d = odd · exp(phi(even))
        dodd += dd * exp_phi
        deven += self._module_back(path, "phi", cache["phi_c"], dd * odd * exp_phi, grads)
        dx = np.empty((dout.shape[0], deven.shape[1] + dodd.shape[1]))
        dx[:, ::2] = deven
        dx[:, 1::2] = dodd
        return dx

    def features(self, X: np.ndarray) -> np.ndarray:
        """Frozen encoder tree + residual (SCINet.py:379-381)."""
        X = np.asarray(X, dtype=np.float64)
        return self._tree("r", self.levels - 1, X) + X

    def fit(self, X: np.ndarray, Y: np.ndarray) -> float:
        """Closed-form ridge for the time-axis projection (projection1),
        conv tree frozen — the fast deterministic default."""
        Z = self.features(X)
        A = Z.T @ Z + self.ridge * np.eye(self.n_in)
        B = Z.T @ np.asarray(Y, dtype=np.float64)
        self.proj = np.linalg.solve(A, B).T  # (n_out, n_in)
        self.fitted = True
        pred = Z @ self.proj.T
        return float(((pred - Y) ** 2).mean())

    def _flat_params(self) -> dict[str, np.ndarray]:
        p = {"proj": self.proj}
        for path, node in self.nodes.items():
            for k, v in node.items():
                p[path + "/" + k] = v
        return p

    def _grads(self, X: np.ndarray, Y: np.ndarray):
        """Full analytic gradients through projection AND the interaction
        tree (conv stacks, exp/mul couplings, zip recursion)."""
        X = np.asarray(X, dtype=np.float64)
        Y = np.asarray(Y, dtype=np.float64)
        tree_out, cache = self._tree_fwd("r", self.levels - 1, X)
        feat = tree_out + X
        pred = feat @ self.proj.T
        err = pred - Y
        loss = float((err * err).mean())
        d_pred = 2.0 * err / err.size
        grads = {k: np.zeros_like(v) for k, v in self._flat_params().items()}
        grads["proj"] += d_pred.T @ feat
        d_feat = d_pred @ self.proj
        self._tree_back("r", self.levels - 1, cache, d_feat, grads)
        return loss, grads

    def fit_bp(
        self,
        X: np.ndarray,
        Y: np.ndarray,
        epochs: int = 80,
        lr: float = 5e-3,
        max_grad_norm: float = 5.0,
        patience: int = 10,
        val_frac: float = 0.2,
    ) -> list[float]:
        """End-to-end training: every conv weight in the even/odd interaction
        tree plus the projection, full-batch Adam with early stop — the
        complete SCINet.py training contract (ridge `fit` remains the cheap
        reservoir-style alternative). Warm-starts the projection with one
        ridge solve so early epochs aren't wasted learning scale."""
        X = np.asarray(X, dtype=np.float64)
        Y = np.asarray(Y, dtype=np.float64)
        cut = _val_split(len(X), val_frac)
        Xtr, Ytr, Xva, Yva = X[:cut], Y[:cut], X[cut:], Y[cut:]
        if not len(Xva):
            Xva, Yva = Xtr, Ytr
        self.fit(Xtr, Ytr)  # ridge warm start for proj
        params = self._flat_params()
        opt = _Adam(params, lr)
        # the warm start competes as a checkpoint too: if no Adam epoch beats
        # its validation loss, training falls back to exactly the ridge model
        v0 = float(((self.predict(Xva) - Yva) ** 2).mean())
        best = (v0, {k: v.copy() for k, v in params.items()})
        bad, hist = 0, []
        with _blas_single_thread():
            for _ in range(epochs):
                loss, g = self._grads(Xtr, Ytr)
                hist.append(loss)
                _clip_global(g, max_grad_norm)
                opt.step(params, g)  # in-place: params alias self.proj / nodes
                self.proj = params["proj"]
                v = self.predict(Xva)
                v_loss = float(((v - Yva) ** 2).mean())
                if v_loss < best[0] - 1e-12:
                    best = (v_loss, {k: v.copy() for k, v in params.items()})
                    bad = 0
                else:
                    bad += 1
                    if bad >= patience:
                        break
        # restore best checkpoint
        self.proj = best[1]["proj"]
        for key, v in best[1].items():
            if "/" in key:
                path, name = key.split("/", 1)
                self.nodes[path][name] = v
        self.fitted = True
        return hist

    def predict(self, X: np.ndarray) -> np.ndarray:
        # single-thread BLAS: also runs inside executor pandas-UDF workers
        with _blas_single_thread():
            return self.features(X) @ self.proj.T

    def weights(self) -> dict[str, np.ndarray]:
        w = {"proj": self.proj.copy()}
        for path, node in self.nodes.items():
            for k, v in node.items():
                w[path + "/" + k] = v.copy()
        return w

    @classmethod
    def from_weights(cls, w: dict[str, np.ndarray], n_in: int = 24, n_out: int = 24, levels: int = 2) -> "SCINetNP":
        m = cls(n_in=n_in, n_out=n_out, levels=levels)
        m.proj = np.asarray(w["proj"], dtype=np.float64)
        for key, v in w.items():
            if "/" in key:
                path, name = key.split("/", 1)
                m.nodes[path][name] = np.asarray(v, dtype=np.float64)
        m.fitted = True
        return m
