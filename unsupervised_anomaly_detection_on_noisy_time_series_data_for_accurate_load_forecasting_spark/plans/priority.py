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


class _Edge:
    """One import relationship M -> dep: per-imported-name local bindings
    (so taint maps a changed def to exactly the token a consumer would
    write), module-alias bindings for whole-module imports (any attribute
    access can observe any tainted name), and a star flag (untrackable —
    consumers degrade to whole-module taint)."""

    __slots__ = ("bindings", "aliases", "star")

    def __init__(self) -> None:
        self.bindings: dict[str, set[str]] = {}  # imported name -> local tokens
        self.aliases: set[str] = set()  # module-alias tokens
        self.star = False


def _import_edges() -> dict[str, dict[str, _Edge]]:
    """Name-aware import graph: module -> {dep module -> _Edge}."""
    edges: dict[str, dict[str, _Edge]] = {}
    for py in _PKG_ROOT.rglob("*.py"):
        mod = _module_of(py)
        if mod is None:
            continue
        try:
            src = py.read_text()
        except OSError:
            continue
        is_init = py.name == "__init__.py"
        mod_parts = mod.split(".") if mod else []
        pkg_parts = mod_parts if is_init else mod_parts[:-1]
        deps = edges.setdefault(mod, {})

        def _edge(dep: str) -> _Edge:
            return deps.setdefault(dep, _Edge())

        for m in _IMPORT_RE.finditer(src):
            dots, name, imported = len(m.group(1)), m.group(2), m.group(3)
            cut = len(pkg_parts) - (dots - 1)
            anchor = pkg_parts[:cut] if cut >= 0 else []
            target = ".".join(anchor + ([name] if name else [])).strip(".")
            leaves: dict[str, str] = {}  # imported name -> local binding
            star = False
            for item in imported.strip("()").replace("\n", ",").split(","):
                parts = [p.strip() for p in item.strip().split(" as ")]
                leaf, binding = parts[0], parts[-1]
                if leaf == "*":
                    star = True
                elif leaf and re.fullmatch(r"\w+", leaf) and re.fullmatch(r"\w+", binding):
                    leaves[leaf] = binding
            if target:
                e = _edge(target)
                if star:
                    e.star = True
                for leaf, binding in leaves.items():
                    sub = f"{target}.{leaf}"
                    if _is_module(sub):
                        # `from X import submod [as t]`: a whole-module alias
                        _edge(sub).aliases.add(binding)
                    else:
                        e.bindings.setdefault(leaf, set()).add(binding)
            else:
                for leaf, binding in leaves.items():
                    if _is_module(leaf):
                        _edge(leaf).aliases.add(binding)
    return edges




_ALL = "<all>"  # whole-module taint marker in _taint_fixpoint results


def _nonimport_module_level(src: str) -> str:
    """Source text of the top-level statements that are neither imports nor
    def/class — the code that evaluates module constants at import time."""
    import ast

    try:
        tree = ast.parse(src)
    except SyntaxError:
        return src
    lines = src.splitlines(keepends=True)
    keep = []
    skip = (ast.Import, ast.ImportFrom, ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
    for node in tree.body:
        if not isinstance(node, skip):
            keep.append("".join(lines[node.lineno - 1 : node.end_lineno]))
    return "".join(keep)


def _module_src(mod: str) -> str | None:
    p = _PKG_ROOT.joinpath(*mod.split("."))
    f = p.with_suffix(".py")
    if not f.is_file():
        f = p / "__init__.py"
    try:
        return f.read_text()
    except OSError:
        return None


def _taint_fixpoint(
    changed: dict[str, set[str]],
    edges: dict[str, dict[str, tuple[set[str] | None, set[str]]]],
) -> dict[str, set[str]]:
    """NAME-level taint propagation to a global fixpoint: module -> set of
    top-level def names whose behavior can observe a change ({_ALL} marks a
    whole module, constants included).

    Seeds: the directly-edited defs per module (module-level/parse-error
    edits seed _ALL). Propagation per module: an import edge contributes its
    local binding tokens when the dep exposes any tainted name the edge can
    see (whole-module import, or imported-name ∩ dep's tainted defs); a def
    is tainted when its own source block mentions a contributing token, a
    changed/tainted sibling, or a tainted local helper (iterated within the
    module). If NON-IMPORT module-level code mentions a token, import-time
    constants may differ and the module degrades to _ALL.

    This is what keeps a hub-module edit surgical: editing one reader
    function taints only the queries whose blocks (transitively) reference
    it — not every consumer of the hub's other exports."""
    tainted: dict[str, set[str]] = {}
    for m, names in changed.items():
        if m in _ORDERING_ONLY:
            continue
        s = set(names)
        if "<module-level>" in s or "<parse-error>" in s:
            tainted[m] = {_ALL}
        else:
            tainted[m] = s

    spans_cache: dict[str, dict[str, str] | None] = {}
    ml_cache: dict[str, str] = {}

    def spans(m: str) -> dict[str, str] | None:
        if m not in spans_cache:
            src = _module_src(m)
            if src is None:
                spans_cache[m] = None
                ml_cache[m] = ""
            else:
                spans_cache[m] = _func_spans(src)
                ml_cache[m] = _nonimport_module_level(src)
        return spans_cache[m]

    while True:
        grew = False
        for m, deps in edges.items():
            if m in _ORDERING_ONLY:
                continue
            cur = tainted.get(m, set())
            if _ALL in cur:
                continue
            tokens: set[str] = set(cur)  # changed sibling defs are tokens too
            star_tainted = False
            for dep, edge in deps.items():
                if dep in _ORDERING_ONLY:
                    continue
                dt = tainted.get(dep, set())
                if not dt:
                    continue
                if edge.star:
                    star_tainted = True  # untrackable re-export — whole module
                if edge.aliases:
                    tokens |= edge.aliases  # alias.attr can reach any name
                if _ALL in dt:
                    tokens |= {t for toks in edge.bindings.values() for t in toks}
                else:
                    for imported, toks in edge.bindings.items():
                        if imported in dt:
                            tokens |= toks
            if star_tainted:
                if cur != {_ALL}:
                    tainted[m] = {_ALL}
                    grew = True
                continue
            if not tokens:
                continue
            sp = spans(m)
            if sp is None:
                new = {_ALL}
            else:
                new = set(cur)
                local_grew = True
                while local_grew:
                    local_grew = False
                    pat = re.compile(
                        r"\b(" + "|".join(map(re.escape, sorted(tokens))) + r")\b"
                    )
                    if pat.search(ml_cache[m]):
                        new = {_ALL}
                        break
                    for name, seg in sp.items():
                        if name == "<module-level>" or name in new:
                            continue
                        if pat.search(seg):
                            new.add(name)
                            tokens.add(name)
                            local_grew = True
            if new != cur:
                tainted[m] = new
                grew = True
        if not grew:
            return tainted


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


def _module_level_stmts(src: str) -> list[str] | None:
    """Texts of the top-level statements with import-time BEHAVIOR: not
    imports (tracked as graph edges), not def/class (tracked by name), not
    bare string expressions (docstrings). None on parse failure."""
    import ast

    try:
        tree = ast.parse(src)
    except SyntaxError:
        return None
    lines = src.splitlines(keepends=True)
    out: list[str] = []
    for node in tree.body:
        if isinstance(
            node,
            (ast.Import, ast.ImportFrom, ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef),
        ):
            continue
        if isinstance(node, ast.Expr) and isinstance(node.value, ast.Constant) and isinstance(
            node.value.value, str
        ):
            continue  # docstring / block comment string
        out.append("".join(lines[node.lineno - 1 : node.end_lineno]))
    return out


def _func_spans(src: str) -> dict[str, str]:
    """Top-level def/class name -> its source segment (decorators included),
    plus '<module-level>' covering the behavioral non-def statements
    (constants, registrations run at import — imports and docstrings
    excluded; see _module_level_stmts). Parse failure degrades to one
    whole-file span so any textual change still counts."""
    import ast

    try:
        tree = ast.parse(src)
    except SyntaxError:
        return {"<parse-error>": src}
    lines = src.splitlines(keepends=True)
    out: dict[str, str] = {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            start = min([d.lineno for d in node.decorator_list] + [node.lineno]) - 1
            out[node.name] = "".join(lines[start : node.end_lineno])
    out["<module-level>"] = "".join(_module_level_stmts(src) or [])
    return out


def _changed_names(old_src: str | None, new_src: str | None) -> set[str]:
    """Names whose top-level source changed or disappeared between the two
    versions, plus '<module-level>' when a pre-existing behavioral
    module-level statement was edited or removed. Purely ADDED code — new
    defs, new constants, new imports, docstring edits — is deliberately a
    no-op: existing consumers cannot reference names that did not exist,
    so additions must not flip every query in the import closure to the
    changed category (the round-5 crowding mode — round 4's was the same
    bug one level up)."""
    if new_src is None:  # file deleted: every old name is gone
        return set(_func_spans(old_src or ""))
    if old_src is None:  # new file: only new queries (never-green) use it
        return {"<module-level>"} if _func_spans(new_src)["<module-level>"] else set()
    old, new = _func_spans(old_src), _func_spans(new_src)
    changed = {
        name
        for name, seg in old.items()
        if name != "<module-level>" and new.get(name) != seg
    }
    # module-level: multiset containment — every old behavioral statement
    # must survive verbatim (anywhere in the file); insertions are free
    old_ml = _module_level_stmts(old_src)
    new_ml = _module_level_stmts(new_src)
    if old_ml is None or new_ml is None:
        if old.get("<module-level>") != new.get("<module-level>"):
            changed.add("<module-level>")
    else:
        from collections import Counter

        missing = Counter(old_ml) - Counter(new_ml)
        if missing:
            changed.add("<module-level>")
    return changed


def _changed_map_since(sha: str | None) -> dict[str, set[str]]:
    """module -> names of its changed-or-removed top-level defs (function-
    level diff vs the verdict commit; committed, unstaged, and untracked
    changes alike). A module appears only if something EXISTING changed."""
    files: set[str] = set()
    if sha:
        files |= set(_git("diff", "--name-only", sha).splitlines())
    files |= set(_git("ls-files", "--others", "--exclude-standard").splitlines())
    out: dict[str, set[str]] = {}
    for f in files:
        p = _REPO_ROOT / f
        m = _module_of(p)
        if m is None:
            continue
        try:
            new_src = p.read_text()
        except OSError:
            new_src = None
        old_src = None
        if sha:
            try:
                old_src = _git("show", f"{sha}:{f}")
            except RuntimeError:
                old_src = None  # absent at the verdict commit
        names = _changed_names(old_src, new_src)
        if names:
            out[m] = names
    return out


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
        edges = _import_edges()
        verdicts = _verdict_commits()
        changed_cache: dict[int, dict[str, set[str]]] = {}
        affected_cache: dict[int, set[str]] = {}

        def changed_since_round(rnd: int) -> dict[str, set[str]]:
            if rnd not in changed_cache:
                changed_cache[rnd] = _changed_map_since(verdicts.get(rnd))
            return changed_cache[rnd]

        taint_cache: dict[int, dict[str, set[str]]] = {}

        def taint_since_round(rnd: int) -> dict[str, set[str]]:
            if rnd not in taint_cache:
                taint_cache[rnd] = _taint_fixpoint(changed_since_round(rnd), edges)
            return taint_cache[rnd]

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
            own = changed.get(rel, set())
            # math-changed = this query's OWN registered block (or its
            # module's import-time code) was edited — a sibling query's edit
            # in the same file is a dependency change, not this query's.
            fn = REGISTRY[name].spark.__name__
            if fn in own or "<module-level>" in own or "<parse-error>" in own:
                math_changed.add(name)
            else:
                # name-level taint: only queries whose block (transitively)
                # references something that actually changed are suspect
                t = taint_since_round(rnd).get(rel, set())
                if _ALL in t or fn in t:
                    closure_changed.add(name)
    except Exception:
        pass

    # Evidence-age bound (r8 verdict ask): a query whose last green row is
    # STALE_ROUNDS+ rounds old outranks even math-changed queries — rotation
    # must not starve behind a steady stream of edits/new queries (the five
    # r2-green TPC-H/rollup queries sat unchecked for 6 rounds while taint
    # and new registrations filled every window).
    STALE_ROUNDS = 6
    cur_round = max(last.values(), default=0) + 1

    def key(name: str):
        if name not in last:
            cat = 0
        elif cur_round - last[name] >= STALE_ROUNDS:
            cat = 1
        elif name in math_changed:
            cat = 2
        elif name in closure_changed:
            cat = 3
        else:
            cat = 4
        return (cat, last.get(name, 0), order[name])

    return sorted(registry_names, key=key)
