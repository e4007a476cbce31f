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


def _import_edges() -> dict[str, dict[str, tuple[set[str] | None, set[str]]]]:
    """Name-aware import graph: module -> {dep module -> (imported names or
    None for whole-module/star, local binding tokens)}. The names let taint
    propagation skip constants-only imports from a function-edited module;
    the binding tokens (post-``as`` aliases) let the per-query refinement
    search a query's own source block for references to tainted imports."""
    edges: dict[str, dict[str, tuple[set[str] | None, set[str]]]] = {}
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

        def _add(dep: str, names: set[str] | None, toks: set[str]) -> None:
            if dep in deps:
                old_names, old_toks = deps[dep]
                merged = None if (old_names is None or names is None) else old_names | names
                deps[dep] = (merged, old_toks | toks)
            else:
                deps[dep] = (names, set(toks))

        for m in _IMPORT_RE.finditer(src):
            dots, name, imported = len(m.group(1)), m.group(2), m.group(3)
            cut = len(pkg_parts) - (dots - 1)
            anchor = pkg_parts[:cut] if cut >= 0 else []
            target = ".".join(anchor + ([name] if name else [])).strip(".")
            leaves: dict[str, str] = {}  # imported name -> local binding
            star = False
            for item in imported.strip("()").replace("\n", ",").split(","):
                parts = [p.strip() for p in item.strip().split(" as ")]
                leaf = parts[0]
                binding = parts[-1]
                if leaf == "*":
                    star = True
                elif leaf and re.fullmatch(r"\w+", leaf) and re.fullmatch(r"\w+", binding):
                    leaves[leaf] = binding
            if target:
                _add(
                    target,
                    None if star else set(leaves),
                    set(leaves.values()),
                )
            base = target
            for leaf, binding in leaves.items():
                sub = f"{base}.{leaf}" if base else leaf
                if _is_module(sub):
                    _add(sub, None, {binding})
    return edges


def _module_def_names(mod: str) -> set[str]:
    """Current top-level def/class names of a package module (empty if the
    file is gone or unreadable — callers then treat every name as a def)."""
    p = _PKG_ROOT.joinpath(*mod.split("."))
    f = p.with_suffix(".py")
    if not f.is_file():
        f = p / "__init__.py"
    try:
        src = f.read_text()
    except OSError:
        return set()
    spans = _func_spans(src)
    spans.pop("<module-level>", None)
    return set(spans)


def _edge_tainted(
    dep: str,
    names: set[str] | None,
    changed: dict[str, set[str]],
    affected: set[str],
) -> bool:
    """Can an import edge observe a change? Direct change in the dep:
    module-level change or whole-module/star import → yes; named imports →
    only if some imported name is a def/class of the dep (an unchanged def
    can still call the changed one internally, but an imported CONSTANT was
    evaluated from unchanged module-level code, so constants-only imports
    escape). Transitively affected dep → yes unconditionally (its constants
    may re-evaluate; no name info survives propagation)."""
    if dep in _ORDERING_ONLY:
        return False
    if dep in changed:
        ch = changed[dep]
        if "<module-level>" in ch or "<parse-error>" in ch or names is None:
            return True
        defs = _module_def_names(dep)
        return (not defs and bool(names)) or bool(names & defs)
    return dep in affected


def _affected_modules(
    changed: dict[str, set[str]],
    edges: dict[str, dict[str, tuple[set[str] | None, set[str]]]],
) -> set[str]:
    """Fixpoint taint propagation over the name-aware import graph — the
    module-granularity pass (see :func:`_tainted_defs` for the per-query
    refinement inside a module). Keeps one edited query function in a hub
    module (shared-CTE constants) from flipping every consumer of the
    constants to the changed category."""
    direct = set(changed) - _ORDERING_ONLY
    trans: set[str] = set()
    while True:
        grew = False
        for m, deps in edges.items():
            if m in trans:
                continue
            for dep, (names, _toks) in deps.items():
                if dep in trans or _edge_tainted(dep, names, changed, set()):
                    trans.add(m)
                    grew = True
                    break
        if not grew:
            return trans | direct


def _module_src(mod: str) -> str | None:
    p = _PKG_ROOT.joinpath(*mod.split("."))
    f = p.with_suffix(".py")
    if not f.is_file():
        f = p / "__init__.py"
    try:
        return f.read_text()
    except OSError:
        return None


def _tainted_defs(
    mod: str,
    changed: dict[str, set[str]],
    affected: set[str],
    edges: dict[str, dict[str, tuple[set[str] | None, set[str]]]],
) -> set[str] | None:
    """Per-query refinement: which top-level defs of ``mod`` can observe a
    change — i.e. their source block references a tainted import binding, a
    changed sibling def, or (transitively) a tainted local helper. Returns
    None when precision is impossible (unreadable source, or non-import
    module-level code itself references a tainted binding — then constants
    may have re-evaluated and every def is suspect)."""
    import ast

    src = _module_src(mod)
    if src is None:
        return None
    spans = _func_spans(src)
    spans.pop("<parse-error>", None)
    tokens: set[str] = set(changed.get(mod, set()))
    tokens.discard("<module-level>")
    for dep, (names, toks) in edges.get(mod, {}).items():
        if _edge_tainted(dep, names, changed, affected):
            tokens |= toks
    if not tokens:
        return set()

    def pat() -> "re.Pattern[str]":
        return re.compile(r"\b(" + "|".join(map(re.escape, sorted(tokens))) + r")\b")

    # non-import module-level statements referencing a tainted binding mean
    # import-time constants may differ — give up per-def precision
    try:
        tree = ast.parse(src)
    except SyntaxError:
        return None
    lines = src.splitlines(keepends=True)
    p = pat()
    for node in tree.body:
        if isinstance(
            node, (ast.Import, ast.ImportFrom, ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
        ):
            continue
        if p.search("".join(lines[node.lineno - 1 : node.end_lineno])):
            return None

    tainted: set[str] = set()
    grew = True
    while grew:
        grew = False
        p = pat()
        for name, seg in spans.items():
            if name in tainted or name == "<module-level>":
                continue
            if p.search(seg):
                tainted.add(name)
                tokens.add(name)
                grew = True
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


def _func_spans(src: str) -> dict[str, str]:
    """Top-level def/class name -> its source segment (decorators included),
    plus '<module-level>' covering every non-def statement (constants,
    registrations run at import). Parse failure degrades to one whole-file
    span so any textual change still counts."""
    import ast

    try:
        tree = ast.parse(src)
    except SyntaxError:
        return {"<parse-error>": src}
    lines = src.splitlines(keepends=True)
    out: dict[str, str] = {}
    other: list[str] = []
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            start = min([d.lineno for d in node.decorator_list] + [node.lineno]) - 1
            out[node.name] = "".join(lines[start : node.end_lineno])
        else:
            other.append("".join(lines[node.lineno - 1 : node.end_lineno]))
    out["<module-level>"] = "".join(other)
    return out


def _changed_names(old_src: str | None, new_src: str | None) -> set[str]:
    """Names whose top-level source changed or disappeared between the two
    versions, plus '<module-level>' when non-def module code moved. Purely
    ADDED names are deliberately excluded: appending a new operator to a
    module is a no-op for the module's existing consumers, so it must not
    flip every query in its import closure to the changed category (the
    round-5 crowding mode — round 4's was the same bug one level up)."""
    if new_src is None:  # file deleted: every old name is gone
        return set(_func_spans(old_src or ""))
    if old_src is None:  # new file: only new queries (never-green) use it
        return {"<module-level>"} if _func_spans(new_src)["<module-level>"] else set()
    old, new = _func_spans(old_src), _func_spans(new_src)
    return {name for name, seg in old.items() if new.get(name) != seg}


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

        def affected_since_round(rnd: int) -> set[str]:
            if rnd not in affected_cache:
                affected_cache[rnd] = _affected_modules(changed_since_round(rnd), edges)
            return affected_cache[rnd]

        tainted_cache: dict[tuple[int, str], set[str] | None] = {}

        def tainted_defs(rnd: int, rel: str) -> set[str] | None:
            k = (rnd, rel)
            if k not in tainted_cache:
                tainted_cache[k] = _tainted_defs(
                    rel, changed_since_round(rnd), affected_since_round(rnd), edges
                )
            return tainted_cache[k]

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
            elif own or rel in affected_since_round(rnd):
                # per-def refinement: inside an affected module, only the
                # queries whose own block references a tainted binding (or
                # a tainted local helper / changed sibling) are suspect
                tq = tainted_defs(rnd, rel)
                if tq is None or fn in tq:
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
