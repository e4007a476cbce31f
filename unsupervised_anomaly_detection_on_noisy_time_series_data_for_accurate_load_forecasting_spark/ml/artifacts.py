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
import shutil
import uuid

import numpy as np


from contextlib import contextmanager


@contextmanager
def single_threaded_blas():
    """Pin OpenBLAS to ONE thread for the duration of a deterministic fit.

    OpenBLAS picks GEMM kernel splits — and therefore float reduction
    ORDER — by thread count, so the same training on the same data yields
    different low bits under different thread pools (measured: three
    distinct fc_ab weight hashes at 1/4/32 threads; an artifact trained in
    one environment then failed the mirror oracle by 4e-7 when the check
    process refit under another). Every artifact-producing driver-side fit
    runs inside this pin so stored weights are reproducible in ANY later
    process — restore-vs-refit equality is exactly what the keyed-artifact
    doctrine and the mirror oracles assume. The fits are seconds-long d×d
    style problems; single-threaded BLAS costs little and buys
    bit-stability. No-op (fit proceeds unpinned) if the OpenBLAS control
    symbols are absent."""
    import ctypes
    import re

    try:
        with open("/proc/self/maps") as f:
            paths = sorted(set(re.findall(r"/\S*openblas\S*", f.read())))
        if not paths:
            yield
            return
        lib = ctypes.CDLL(paths[0])
        get = getattr(lib, "openblas_get_num_threads64_", None) or getattr(
            lib, "openblas_get_num_threads", None
        )
        set_ = getattr(lib, "openblas_set_num_threads64_", None) or getattr(
            lib, "openblas_set_num_threads", None
        )
        if get is None or set_ is None:
            yield
            return
        prev = int(get())
        set_(1)
        try:
            yield
        finally:
            set_(prev)
    except OSError:
        yield


def _promote_dir(tmp: str, dest: str) -> None:
    """Atomically promote a PRIVATE tmp dir to its content-addressed final
    path. The tmp dir carries a per-process unique suffix, so concurrent
    builders of the same key never write into each other's in-flight output;
    whoever renames first wins, and losing the race (dest appeared — EEXIST/
    ENOTEMPTY, or a final isdir re-check) just discards our copy and keeps
    theirs: the key is content-addressed, both copies are byte-equivalent."""
    try:
        os.rename(tmp, dest)
    except OSError:
        if os.path.isdir(dest):  # lost the race — keep theirs
            shutil.rmtree(tmp, ignore_errors=True)
        else:
            raise


def _unique_tmp(path: str) -> str:
    return f"{path}.tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"


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


# ---------------------------------------------------------------------------
# Keyed trained-weight store (the reference's checkpoint restore,
# early_stop.py:41-46): a fit is deterministic in (training data, model
# source, hyperparameters), so its weights are cached on disk under a key
# derived from exactly those three — a math or data change rotates the key
# and forces a refit, making stale-weight reuse impossible by construction.
# The correctness oracle (an independent numpy mirror that always refits)
# would catch a collision as a hash mismatch.
# ---------------------------------------------------------------------------

import hashlib
import sys

_CACHE_ENV = "SPARK_GRAFT_WEIGHTS_DIR"

# Cold/warm access log for the across-run artifact store (r15 verdict §2:
# the bench must disclose whether a run restored artifacts or built them).
# One entry per artifact NAME per process; first touch wins, so an initial
# miss that then builds stays "cold" even though later reads hit.
_ACCESS_LOG: dict[str, str] = {}


def _record_access(label: str, hit: bool) -> None:
    _ACCESS_LOG.setdefault(label, "warm" if hit else "cold")


def artifact_access_log() -> dict[str, str]:
    """{artifact name: "warm"|"cold"} for every keyed artifact this process
    tried to restore (bench.py prints it in the JSON line)."""
    return dict(_ACCESS_LOG)


def weights_cache_dir() -> str:
    default = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".weights_cache",
    )
    return os.environ.get(_CACHE_ENV, default)


def source_fingerprint(*module_names: str, extra: str = "") -> str:
    """sha256 over the source text of the given (imported) modules plus an
    explicit hyperparameter string — part of every weight key, so editing
    the model math or schedules invalidates cached fits."""
    h = hashlib.sha256()
    for name in module_names:
        mod = sys.modules[name]
        with open(mod.__file__, "rb") as f:
            h.update(f.read())
        h.update(b"\x00")
    h.update(extra.encode())
    return h.hexdigest()


def train_data_key(arrays: list[np.ndarray], fingerprint: str) -> str:
    """sha256 over the training matrices (C-order float bytes) + the source
    fingerprint. Bounded cost: training samples are driver-capped upstream."""
    h = hashlib.sha256(fingerprint.encode())
    for a in arrays:
        a = np.ascontiguousarray(a)
        h.update(str(a.dtype).encode())
        h.update(str(a.shape).encode())
        h.update(a.tobytes())
    return h.hexdigest()[:24]


def input_data_fingerprint(paths: list[str], fingerprint: str) -> str:
    """Cheap RESTORE key: sha256 over the raw bytes of the input files
    (directories walked in sorted order, relative name + content per file)
    plus a source fingerprint covering the ENTIRE derivation chain from
    those files to the training matrices.

    The expensive :func:`train_data_key` hashes the collected training
    matrices — sound, but computing it requires running the Spark derivation
    (build windows, collect), which costs as much as the fit it was meant to
    skip. Because that derivation is deterministic in (input files, chain
    source), this fingerprint is a faithful proxy: any change to the data
    bytes or any module in the chain rotates it, forcing the honest slow
    path. Used via the alias map (:func:`load_alias`/:func:`save_alias`)
    which records alias → data key, so a warm restore is pure file I/O."""
    h = hashlib.sha256(fingerprint.encode())
    for p in paths:
        files = []
        if os.path.isdir(p):
            for root, _dirs, names in os.walk(p):
                for n in sorted(names):
                    files.append(os.path.join(root, n))
            files.sort(key=lambda f: os.path.relpath(f, p))
        else:
            files.append(p)
        for f in sorted(files):
            rel = os.path.relpath(f, p) if os.path.isdir(p) else os.path.basename(f)
            h.update(rel.encode())
            with open(f, "rb") as fh:
                h.update(fh.read())
            h.update(b"\x00")
    return h.hexdigest()[:24]


def dataframe_ckpt_path(kind: str, key: str) -> str:
    return os.path.join(weights_cache_dir(), f"{kind}-{key}")


def restore_dataframe(spark, kind: str, key: str):
    """Read back a checkpointed derived frame (None when absent). The
    deployment shape of a resident engine's build artifacts (an ANN index,
    a feature bank): deterministic derived tables are parquet on shared
    storage, keyed by input content + derivation source, so a restore is a
    scan instead of a recompute."""
    p = dataframe_ckpt_path(kind, key)
    if not os.path.isdir(p):
        _record_access(kind, hit=False)
        return None
    _record_access(kind, hit=True)
    return spark.read.parquet(p)


def checkpoint_dataframe(df, kind: str, key: str, n_files: int = 8):
    """Write a derived frame to the artifact store (private tmp dir +
    atomic rename, same race discipline as save_weight_groups) and return
    the re-read frame so every session — the writer included — serves the
    identical bytes."""
    p = dataframe_ckpt_path(kind, key)
    tmp = _unique_tmp(p)
    df.coalesce(n_files).write.mode("overwrite").parquet(tmp)
    _promote_dir(tmp, p)
    return df.sparkSession.read.parquet(p)


def load_alias(name: str, alias: str) -> str | None:
    """Resolve a cheap input-data alias to the expensive train-data key
    recorded by a previous slow-path run (None when absent)."""
    p = os.path.join(weights_cache_dir(), f"alias-{name}-{alias}.json")
    try:
        with open(p) as f:
            key = json.load(f)["key"]
    except (OSError, ValueError, KeyError):
        _record_access(name, hit=False)
        return None
    _record_access(name, hit=True)
    return key


def save_alias(name: str, alias: str, key: str) -> None:
    """Record alias → data key (atomic rename, same race discipline as
    save_weight_groups)."""
    d = weights_cache_dir()
    os.makedirs(d, exist_ok=True)
    p = os.path.join(d, f"alias-{name}-{alias}.json")
    tmp = _unique_tmp(p)
    with open(tmp, "w") as f:
        json.dump({"key": key}, f)
    os.replace(tmp, p)  # plain file: replace is atomic and last-writer-wins


def save_weight_groups(name: str, key: str, groups: dict[str, dict[str, np.ndarray]]) -> None:
    """Persist {group: {param: array}} as one npz + a JSON manifest (no
    pickle; portable). Atomic via rename so a concurrent reader never sees
    a half-written artifact."""
    d = os.path.join(weights_cache_dir(), f"{name}-{key}")
    tmp = _unique_tmp(d)
    os.makedirs(tmp, exist_ok=True)
    manifest: list[tuple[str, str, str]] = []
    flat: dict[str, np.ndarray] = {}
    for gi, (g, params) in enumerate(sorted(groups.items())):
        for pi, (p, arr) in enumerate(sorted(params.items())):
            sk = f"a{gi}_{pi}"
            manifest.append((g, p, sk))
            flat[sk] = np.asarray(arr)
    np.savez_compressed(os.path.join(tmp, "weights.npz"), **flat)
    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    _promote_dir(tmp, d)


def load_weight_groups(name: str, key: str) -> dict[str, dict[str, np.ndarray]] | None:
    d = os.path.join(weights_cache_dir(), f"{name}-{key}")
    try:
        with open(os.path.join(d, "manifest.json")) as f:
            manifest = json.load(f)
        with np.load(os.path.join(d, "weights.npz")) as z:
            out: dict[str, dict[str, np.ndarray]] = {}
            for g, p, sk in manifest:
                out.setdefault(g, {})[p] = z[sk]
    except (OSError, ValueError, KeyError):
        _record_access(name, hit=False)
        return None
    _record_access(name, hit=True)
    return out


def save_bank_keyed(name: str, key: str, bank: np.ndarray, meta: dict | None = None) -> None:
    """Keyed, atomic variant of save_bank for checkpoint-restore use (same
    race discipline as save_weight_groups: write to a tmp dir, rename)."""
    d = os.path.join(weights_cache_dir(), f"{name}-{key}")
    tmp = _unique_tmp(d)
    os.makedirs(tmp, exist_ok=True)
    np.savez_compressed(os.path.join(tmp, "bank.npz"), bank=np.asarray(bank))
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump(meta or {}, f, sort_keys=True)
    _promote_dir(tmp, d)


def load_bank_keyed(name: str, key: str) -> np.ndarray | None:
    d = os.path.join(weights_cache_dir(), f"{name}-{key}")
    try:
        bank = np.load(os.path.join(d, "bank.npz"))["bank"]
    except (OSError, ValueError, KeyError):
        _record_access(name, hit=False)
        return None
    _record_access(name, hit=True)
    return bank
