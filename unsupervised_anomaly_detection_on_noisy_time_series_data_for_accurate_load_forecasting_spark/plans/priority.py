"""Self-maintaining correctness priority: derive the driver-gate ordering
from evidence instead of a hand-written list.

The driver hash-checks the FIRST 50 entries of ``queries()`` each round.
Round 3 hand-maintained that window and missed one changed query
(``t_quality_score``); round 4's first cut of this module missed three more
by computing "changed" globally (changed since the *latest* verdict commit,
expanded through the import graph) — a shared-view module sat in nearly
every query's closure, so dozens of behaviorally-unchanged queries crowded
the genuinely math-changed ones out of the 50-slot window.

This version computes change evidence **per query**:

1. ``CORRECTNESS_r*.json`` — which queries have a green driver row, and in
   which round the freshest one landed;
2. ``git diff`` against the verdict commit of *that query's own last green
   round* — a query is "changed" only if code it depends on moved after the
   driver last verified it, not merely since last round;
3. the package's transitive relative-import graph, distinguishing
   **math-changed** (the query's defining module itself was edited) from
   **closure-touched** (only a dependency moved).

Order: never-green first, then math-changed, then closure-touched, then
everything else by ascending last-green round (stalest evidence first) — so
rotation alone bounds every query's evidence age at ~⌈n_queries / 50⌉
rounds. Any failure (no git, missing files) degrades to the previous
category's ordering rather than raising: priority is an optimization, never
a correctness gate itself.
"""

from __future__ import annotations

import json
import re
import subprocess
from pathlib import Path

_PKG_ROOT = Path(__file__).resolve().parents[1]  # the package directory
_REPO_ROOT = _PKG_ROOT.parent
_PKG_NAME = _PKG_ROOT.name

# `from .x import a, b` / `from ..y.z import (a,\n b)` — group 3 captures the
# imported-name list (parenthesized form may span lines; bare form stops at
# end-of-line), so `from ..operators import anomaly` can record the submodule
# dep `operators.anomaly`, not just `operators`.
_IMPORT_RE = re.compile(
    r"^\s*from\s+(\.+)([\w.]*)\s+import\s+(\([^)]*\)|[^\n]*)", re.MULTILINE
)


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


def _is_module(dotted: str) -> bool:
    p = _PKG_ROOT.joinpath(*dotted.split("."))
    return p.with_suffix(".py").is_file() or (p / "__init__.py").is_file()


def _import_graph() -> dict[str, set[str]]:
    """module -> set of package modules it imports (one level), from source
    text: only relative imports (``from .x import``/``from ..y.z import``)
    are package-internal by construction. Records both the from-target and,
    for each imported name that is itself a module, the submodule."""
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
        # The package a relative import resolves against: for a/b.py that is
        # package `a`; for a package's own __init__.py (module `a`) it is
        # `a` itself — anchoring at the module's *parent* there mis-resolved
        # `from .softpatch import x` in ml/__init__.py to bare `softpatch`.
        is_init = py.name == "__init__.py"
        mod_parts = mod.split(".") if mod else []
        pkg_parts = mod_parts if is_init else mod_parts[:-1]
        for m in _IMPORT_RE.finditer(src):
            dots, name, imported = len(m.group(1)), m.group(2), m.group(3)
            # one dot = current package, each extra dot one level up
            cut = len(pkg_parts) - (dots - 1)
            anchor = pkg_parts[:cut] if cut >= 0 else []
            target = ".".join(anchor + ([name] if name else [])).strip(".")
            if target:
                deps.add(target)
            # `from X import Y` where X/Y.py (or X/Y/) exists: dep on X.Y too
            base = target  # may be "" for `from . import x` at package root
            for item in imported.strip("()").replace("\n", ",").split(","):
                leaf = item.strip().split(" as ")[0].strip()
                if not leaf or not re.fullmatch(r"\w+", leaf):
                    continue
                sub = f"{base}.{leaf}" if base else leaf
                if _is_module(sub):
                    deps.add(sub)
        graph[mod] = deps
    return graph


# Modules that only arrange the registry presentation — they sit in every
# query's import closure, so counting them as "code change" would flip the
# whole registry to the changed category whenever the ordering itself is
# touched, crowding genuinely-changed queries out of the 50-slot window.
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
            # `from ..ml.softpatch import x` records `ml.softpatch`; a
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


def _verdict_commits() -> dict[int, str]:
    """round number -> sha of that round's driver verdict commit (the commit
    that carried CORRECTNESS_r{N}.json, i.e. the code state the driver
    verified)."""
    out = _git("log", "--grep", "^round [0-9]*: verdict", "--format=%H %s")
    commits: dict[int, str] = {}
    for line in out.splitlines():
        m = re.match(r"([0-9a-f]+) round (\d+): verdict", line)
        if m:
            commits.setdefault(int(m.group(2)), m.group(1))
    return commits


def _changed_modules_since(sha: str | None) -> set[str]:
    """Package modules touched since ``sha`` (committed, unstaged, and
    untracked changes alike); since the beginning if sha is None."""
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
    rows-green with a positive row count for the explicitly oracle-less
    contract — an errored/empty no-oracle run is not evidence)."""
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
                r.get("err") == "no_oracle" and (r.get("spark_rows") or 0) > 0
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

    # Category per query: 1 = math-changed (defining module edited since the
    # query's own last green row), 2 = closure-touched (a dependency edited
    # since then), 3 = unchanged-since-verified. Computed lazily per green
    # round so each git diff runs at most once.
    math_changed: set[str] = set()
    closure_changed: set[str] = set()
    try:
        graph = _import_graph()
        verdicts = _verdict_commits()
        changed_cache: dict[int, set[str]] = {}

        def changed_since_round(rnd: int) -> set[str]:
            if rnd not in changed_cache:
                changed_cache[rnd] = _changed_modules_since(verdicts.get(rnd))
            return changed_cache[rnd]

        from .registry import REGISTRY

        prefix = _PKG_NAME + "."
        for name in registry_names:
            rnd = last.get(name)
            if rnd is None:
                continue  # never green — already the top category
            changed = changed_since_round(rnd)
            if not changed:
                continue
            mod = REGISTRY[name].spark.__module__
            rel = mod[len(prefix):] if mod.startswith(prefix) else mod
            if rel in changed:
                math_changed.add(name)
            elif _closure(rel, graph) & changed:
                closure_changed.add(name)
    except Exception:
        pass

    def key(name: str):
        if name not in last:
            cat = 0
        elif name in math_changed:
            cat = 1
        elif name in closure_changed:
            cat = 2
        else:
            cat = 3
        return (cat, last.get(name, 0), order[name])

    return sorted(registry_names, key=key)
