"""Trained neural models in pure numpy — the M17/M20/M21 model slots, real.

torch is absent in this environment, so the models are implemented directly:
forward passes, analytic backprop, Adam, gradient clipping, early stopping —
all deterministic (seeded init, fixed full-batch order, no dropout at train
time), so the Spark query and its DuckDB/numpy oracle mirror produce
bit-identical results.

Reference contracts these mirror (citations into /root/reference/):
- M17 denoising autoencoder   src/anomaly_imputation/autoencoder.py:107-167
  (input = masked sequence, target = clean sequence, full-sequence MSE,
   Adam lr 1e-3, grad-clip, early stop with best-checkpoint restore;
   splice per autoencoder.py:187-199 — model output replaces hidden points
   only). The encoder cell here is an MLP bottleneck rather than a bi-LSTM:
   the *training contract* is the spec, the cell is an implementation.
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

import numpy as np

__all__ = ["DenoisingAE", "GRUSeq2Seq", "SCINetNP"]


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
    """M17: denoising autoencoder seq_len → bottleneck → seq_len."""

    def __init__(self, seq_len: int = 24, embed: int = 8, hidden: int = 32, seed: int = 0):
        rs = np.random.RandomState(seed)
        self.seq_len = seq_len
        self.p = {
            "W1": _glorot(rs, seq_len, hidden),
            "b1": np.zeros(hidden),
            "W2": _glorot(rs, hidden, embed),
            "b2": np.zeros(embed),
            "W3": _glorot(rs, embed, hidden),
            "b3": np.zeros(hidden),
            "W4": _glorot(rs, hidden, seq_len),
            "b4": np.zeros(seq_len),
        }
        self.fitted = False

    def _forward(self, X: np.ndarray):
        p = self.p
        h1 = np.tanh(X @ p["W1"].T + p["b1"])
        z = np.tanh(h1 @ p["W2"].T + p["b2"])  # the embedding
        h2 = np.tanh(z @ p["W3"].T + p["b3"])
        out = h2 @ p["W4"].T + p["b4"]
        return h1, z, h2, out

    def predict(self, X: np.ndarray) -> np.ndarray:
        return self._forward(np.asarray(X, dtype=np.float64))[-1]

    def fit(
        self,
        masked: np.ndarray,
        clean: np.ndarray,
        epochs: int = 300,
        lr: float = 1e-3,
        max_grad_norm: float = 0.05,
        patience: int = 20,
        val_frac: float = 0.2,
    ) -> list[float]:
        """Full-sequence MSE(clean, decode(masked)) — autoencoder.py:134-139's
        'option 1' loss; early stop on val loss with best-weight restore."""
        X = np.asarray(masked, dtype=np.float64)
        Y = np.asarray(clean, dtype=np.float64)
        cut = _val_split(len(X), val_frac)
        Xtr, Ytr, Xva, Yva = X[:cut], Y[:cut], X[cut:], Y[cut:]
        if not len(Xva):
            Xva, Yva = Xtr, Ytr
        opt = _Adam(self.p, lr)
        best = (np.inf, {k: v.copy() for k, v in self.p.items()})
        bad, hist = 0, []
        n = len(Xtr)
        for _ in range(epochs):
            h1, z, h2, out = self._forward(Xtr)
            err = out - Ytr  # (n, L)
            loss = float((err * err).mean())
            hist.append(loss)
            d_out = 2.0 * err / err.size
            g = {}
            g["W4"] = d_out.T @ h2
            g["b4"] = d_out.sum(axis=0)
            d_h2 = (d_out @ self.p["W4"]) * (1 - h2 * h2)
            g["W3"] = d_h2.T @ z
            g["b3"] = d_h2.sum(axis=0)
            d_z = (d_h2 @ self.p["W3"]) * (1 - z * z)
            g["W2"] = d_z.T @ h1
            g["b2"] = d_z.sum(axis=0)
            d_h1 = (d_z @ self.p["W2"]) * (1 - h1 * h1)
            g["W1"] = d_h1.T @ Xtr
            g["b1"] = d_h1.sum(axis=0)
            _clip_global(g, max_grad_norm)
            opt.step(self.p, g)
            v_out = self._forward(Xva)[-1]
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
        out = self.predict(ts)
        ts = np.asarray(ts, dtype=np.float64)
        return np.where(np.asarray(mask) == 1, out, ts)

    def weights(self) -> dict[str, np.ndarray]:
        return {k: v.copy() for k, v in self.p.items()}

    @classmethod
    def from_weights(cls, w: dict[str, np.ndarray], seq_len: int = 24) -> "DenoisingAE":
        m = cls(seq_len=seq_len)
        m.p = {k: np.asarray(v, dtype=np.float64) for k, v in w.items()}
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


def _gru_step(p: dict, prefix: str, x: np.ndarray, h: np.ndarray):
    """torch-convention GRU cell; returns (h', cache for backprop)."""
    H = h.shape[1]
    gi = x @ p[prefix + "Wi"].T + p[prefix + "bi"]
    gh = h @ p[prefix + "Wh"].T + p[prefix + "bh"]
    r = _sigmoid(gi[:, :H] + gh[:, :H])
    z = _sigmoid(gi[:, H : 2 * H] + gh[:, H : 2 * H])
    q = gh[:, 2 * H :]  # h-side pre-activation of the candidate
    n = np.tanh(gi[:, 2 * H :] + r * q)
    h_new = (1 - z) * n + z * h
    return h_new, (x, h, r, z, n, q)


def _gru_back(p: dict, prefix: str, dh_new: np.ndarray, cache, g: dict):
    """Backprop one GRU step: returns (dx, dh_prev); accumulates into g."""
    x, h, r, z, n, q = cache
    H = h.shape[1]
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
    g[prefix + "Wi"] += dgi.T @ x
    g[prefix + "Wh"] += dgh.T @ h
    g[prefix + "bi"] += dgi.sum(axis=0)
    g[prefix + "bh"] += dgh.sum(axis=0)
    dx = dgi @ p[prefix + "Wi"]
    dh_prev = dh_prev + dgh @ p[prefix + "Wh"]
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
    """M21: seeded-frozen SCINet interaction tree + ridge-trained projection."""

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
