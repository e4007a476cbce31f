"""Self-maintaining correctness priority: derive the driver-gate ordering
from evidence instead of a hand-written list.

The driver hash-checks the FIRST 50 entries of ``queries()`` each round.
Round 3 hand-maintained that window and missed one changed query
(``t_quality_score``), so the ordering is now computed from the two sources
of truth that already live in the repo:

1. ``CORRECTNESS_r*.json`` — which queries have a green driver row, and how
   many rounds ago the freshest one is;
2. ``git`` — which package files changed since the last round's verdict
   commit, expanded to affected queries through the package's *transitive
   relative-import graph* (a change to ``ml/softpatch.py`` re-prioritizes
   every query whose plans module reaches it, not just queries defined in
   the edited file).

Order: never-green first, then changed-this-round, then everything else by
ascending last-green round (stalest evidence first) — so rotation alone
bounds every query's evidence age at ~⌈n_queries / 50⌉ rounds. Any failure
(no git, missing files) degrades to the previous category's ordering rather
than raising: priority is an optimization, never a correctness gate itself.
"""

from __future__ import annotations

import json
import re
import subprocess
from pathlib import Path

_PKG_ROOT = Path(__file__).resolve().parents[1]  # the package directory
_REPO_ROOT = _PKG_ROOT.parent
_PKG_NAME = _PKG_ROOT.name

_IMPORT_RE = re.compile(r"^\s*from\s+(\.+)([\w.]*)\s+import\s+", re.MULTILINE)


def _module_of(path: Path) -> str | None:
    """Repo file path -> package-relative dotted module name, or None."""
    try:
        rel = path.resolve().relative_to(_PKG_ROOT)
    except ValueError:
        return None
    parts = list(rel.parts)
    if not parts or not parts[-1].endswith(".py"):
        return None
    parts[-1] = parts[-1][:-3]
    if parts[-1] == "__init__":
        parts = parts[:-1]
    return ".".join(parts)


def _import_graph() -> dict[str, set[str]]:
    """module -> set of package modules it imports (one level), from source
    text: only relative imports (``from .x import``/``from ..y.z import``)
    are package-internal by construction."""
    graph: dict[str, set[str]] = {}
    for py in _PKG_ROOT.rglob("*.py"):
        mod = _module_of(py)
        if mod is None:
            continue
        deps: set[str] = set()
        try:
            src = py.read_text()
        except OSError:
            continue
        base = mod.split(".")
        for m in _IMPORT_RE.finditer(src):
            dots, name = len(m.group(1)), m.group(2)
            # `from .` inside module a.b resolves against a; one extra dot
            # per level up. (A module's own package = its parts minus leaf.)
            anchor = base[: len(base) - dots] if len(base) >= dots else []
            target = ".".join(anchor + ([name] if name else [])).strip(".")
            if target:
                deps.add(target)
        graph[mod] = deps
    return graph


# Modules that only arrange the registry presentation — they sit in every
# query's import closure, so counting them as "code change" would flip the
# whole registry to the changed category whenever the ordering itself is
# touched (exactly what happened when this file was introduced), crowding
# genuinely-changed queries out of the 50-slot window.
_ORDERING_ONLY = {"plans", "plans.priority", "plans.registry"}


def _closure(start: str, graph: dict[str, set[str]]) -> set[str]:
    seen, stack = set(), [start]
    while stack:
        m = stack.pop()
        if m in seen:
            continue
        seen.add(m)
        for d in graph.get(m, ()):
            stack.append(d)
            # `from ..ml.softpatch import x` may record `ml.softpatch`; a
            # change to `ml/__init__.py` (module `ml`) must also count.
            parent = d.rsplit(".", 1)[0]
            if parent != d:
                stack.append(parent)
    return seen - _ORDERING_ONLY


def _git(*args: str) -> str:
    out = subprocess.run(
        ["git", *args], cwd=_REPO_ROOT, capture_output=True, text=True, timeout=30
    )
    if out.returncode != 0:
        raise RuntimeError(out.stderr.strip()[:200])
    return out.stdout


def _changed_modules() -> set[str]:
    """Package modules touched since the last round's verdict commit
    (committed, unstaged, and untracked changes alike)."""
    sha = _git("log", "--grep", "^round [0-9]*: verdict", "-n", "1", "--format=%H").strip()
    files: set[str] = set()
    if sha:
        files |= set(_git("diff", "--name-only", sha).splitlines())
    files |= set(_git("ls-files", "--others", "--exclude-standard").splitlines())
    mods = set()
    for f in files:
        m = _module_of(_REPO_ROOT / f)
        if m:
            mods.add(m)
    return mods


def _last_green_round() -> dict[str, int]:
    """query -> most recent round with a green driver row (hash-green, or
    rows-green for the explicitly oracle-less contract)."""
    last: dict[str, int] = {}
    for path in sorted(_REPO_ROOT.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        for name, r in rows.items():
            green = r.get("hash_match") is True or (
                r.get("err") == "no_oracle" and (r.get("spark_rows") or 0) >= 0
            )
            if green:
                last[name] = max(last.get(name, 0), rnd)
    return last


def auto_priority(registry_names: list[str]) -> list[str]:
    """Evidence-derived ordering over all registered query names."""
    order = {n: i for i, n in enumerate(registry_names)}
    try:
        last = _last_green_round()
    except Exception:
        last = {}
    try:
        changed = _changed_modules()
        graph = _import_graph()
        # a query is "changed" if its defining module's import closure
        # touches any changed module
        from .registry import REGISTRY

        def is_changed(name: str) -> bool:
            fn = REGISTRY[name].spark
            mod = fn.__module__
            prefix = _PKG_NAME + "."
            rel = mod[len(prefix):] if mod.startswith(prefix) else mod
            return bool(_closure(rel, graph) & changed)

        changed_q = {n for n in registry_names if is_changed(n)}
    except Exception:
        changed_q = set()

    def key(name: str):
        never = name not in last
        return (
            0 if never else (1 if name in changed_q else 2),
            last.get(name, 0),  # stalest evidence first within a category
            order[name],
        )

    return sorted(registry_names, key=key)
