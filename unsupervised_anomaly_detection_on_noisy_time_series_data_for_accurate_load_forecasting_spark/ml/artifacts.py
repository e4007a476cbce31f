"""S9: model artifact sink/source (reference: softpatch.py:403-449 pickles
params + a FAISS index; early_stop.py:41-46 torch checkpoints).

Spark-first shape: artifacts are driver-side files (the bank is small by
construction — a coreset), loaded once per job and **broadcast** to executors
for inference. Format: npz for matrices + JSON sidecar for scalar metadata
(min/max scores, window threshold) — no pickle, so artifacts are portable
across Python versions.
"""

from __future__ import annotations

import json
import os

import numpy as np


def save_bank(path: str, bank: np.ndarray, meta: dict | None = None) -> None:
    os.makedirs(path, exist_ok=True)
    np.savez_compressed(os.path.join(path, "bank.npz"), bank=bank)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta or {}, f, sort_keys=True)


def load_bank(path: str) -> tuple[np.ndarray, dict]:
    bank = np.load(os.path.join(path, "bank.npz"))["bank"]
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    return bank, meta
