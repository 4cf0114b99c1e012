"""Automated evidence-age accounting (r6 verdict task 6).

The driver's 50-query window means each query's correctness row ages
while its implementing code keeps moving. Five rounds of hand-written
`_SWEEP_PRIORITY` queue comments were right by care alone; this makes
the accounting MECHANICAL and exact at QUERY granularity (file
timestamps were tried first and rejected: one edit to a 3000-line plan
module stales every query in the file, which hides the real changes in
noise).

Mechanism — content fingerprints, not timestamps:

- A query's fingerprint hashes its function source, its oracle SQL
  text, and the sources of every package object its body references,
  transitively through package callables (plus the top-level SOURCE
  assignment text of data module globals it uses — thresholds, hash
  constants, weight tables — never their runtime values, which for
  mutable module state like cache registries and observer hooks vary
  per process). An edit anywhere in that closure changes the
  fingerprint; an edit elsewhere in the same file does not.
- `--record` stores the current fingerprint of every query in
  tools/evidence_fp.json, to be run IMMEDIATELY AFTER a full green
  sweep over the same tree: "this exact code was verified". The file
  is committed, so the baseline travels with the repo.
- A later run reports each query as FRESH (fingerprint unchanged since
  the recorded verification) or STALE (code drifted since last
  verified), joined with the newest CORRECTNESS_r*.json round that
  carries the query's green row (evidence age, for queue ordering).

Output: JSON — {"stale": [...], "never_checked": [...], "fresh":
[...], "queue": [...]} where "queue" is the suggested next-round
`_SWEEP_PRIORITY` head: never-checked first, then stale (oldest
evidence round first), then fresh (oldest evidence round first).

Usage:
    python tools/evidence_age.py [--json out.json]   # report
    python tools/evidence_age.py --record            # set baseline
    python tools/evidence_age.py --check             # exit 1 on drift
"""

from __future__ import annotations

import ast
import glob
import hashlib
import importlib
import importlib.util
import inspect
import json
import os
import re
import subprocess
import sys
import textwrap
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PKG = "streaming_data_pipeline_spark"
FP_PATH = os.path.join(REPO, "tools", "evidence_fp.json")
_DATA_TYPES = (str, int, float, bool, bytes, list, tuple, dict, set, frozenset)

# Parsed top-level assignments per package module, cached for the
# process: {module_name: {global_name: (unparsed expr, names the expr
# references)}}.
_MODULE_ASSIGNS: dict[str, dict[str, tuple[str, frozenset[str]]]] = {}

# Top-level `from X import y [as z]` bindings per package module:
# {module_name: {local_name: (source module, original name)}}.
_MODULE_IMPORTS: dict[str, dict[str, tuple[str, str]]] = {}


def _target_names(t) -> list[str]:
    if isinstance(t, ast.Name):
        return [t.id]
    if isinstance(t, (ast.Tuple, ast.List)):
        out: list[str] = []
        for e in t.elts:
            out.extend(_target_names(e))
        return out
    return []  # subscript/attribute targets (ORACLE["x"] = ...) — not a global


def _module(mod_name: str, probe: bool = False) -> types.ModuleType | None:
    """Resolve a package module LOAD-STATE-INDEPENDENTLY: import it when
    absent instead of `sys.modules.get`-and-skip. The skip made
    fingerprints depend on what the process had already imported — a
    query whose closure lazily imports sources/wire_sink fingerprinted
    differently after a test had imported that module than in a clean
    `--check` interpreter (the r8 re-occurrence of r7 verdict task 4,
    caught by the full-suite run of the r9-queue guard).

    ``probe=True`` marks a speculative resolution (the submodule
    fallback in _collect, which fires for ANY `from pkg.mod import x`
    where x is a missing attribute — usually it simply isn't a module):
    a non-existent module is the expected outcome there, so the loud
    'closure is blind' warning is suppressed when no spec exists. Real
    import FAILURES of an existing module still warn."""
    m = sys.modules.get(mod_name)
    if m is not None:
        return m
    if not mod_name.startswith(PKG):
        return None
    try:
        if probe and importlib.util.find_spec(mod_name) is None:
            return None
        return importlib.import_module(mod_name)
    except Exception as exc:
        # A package module that only imports under certain process
        # state (e.g. a live SparkSession) would make fingerprints
        # environment-dependent again — the hygiene test
        # (test_round8_hardening: every package module imports
        # session-less) keeps this path dead; warn loudly if it ever
        # fires so a --check/--record run can't silently go blind.
        print(
            f"evidence_age: cannot import {mod_name} ({exc}) — "
            "fingerprint closure is blind to it",
            file=sys.stderr,
        )
        return None


def _module_assigns(mod_name: str) -> dict[str, tuple[str, frozenset[str]]]:
    """Top-level `NAME = expr` assignments of a package module, as
    SOURCE TEXT. Data globals fold into fingerprints by this text, never
    by runtime value: runtime reprs of mutable module state (the dedup
    live-cache registry, observer hooks) vary per process, which made
    the same tree fingerprint differently inside the full pytest run vs
    a clean interpreter (r7 verdict task 4 — 36 vs 33 stale on
    identical code). Source text cannot be mutated at runtime."""
    cached = _MODULE_ASSIGNS.get(mod_name)
    if cached is not None:
        return cached
    out: dict[str, tuple[str, frozenset[str]]] = {}
    imports: dict[str, tuple[str, str]] = {}
    mod = _module(mod_name)
    path = getattr(mod, "__file__", None)
    if path:
        try:
            src = open(path).read()
            tree = ast.parse(src)
        except (OSError, SyntaxError):
            tree, src = None, ""
        pkg = getattr(mod, "__package__", "") or ""
        for m, orig, local in _imports_of(src, pkg) if tree else []:
            imports[local] = (m, orig)
        for node in tree.body if tree else []:
            if isinstance(node, ast.Assign):
                targets = [n for t in node.targets for n in _target_names(t)]
                value = node.value
            elif isinstance(node, (ast.AnnAssign, ast.AugAssign)) and getattr(
                node, "value", None
            ) is not None:
                targets = _target_names(node.target)
                value = node.value
            else:
                continue
            expr = ast.unparse(value)
            refs = frozenset(
                n.id for n in ast.walk(value) if isinstance(n, ast.Name)
            )
            for t in targets:
                if t in out:  # reassignment / augmented: fold both exprs
                    prev_expr, prev_refs = out[t]
                    out[t] = (f"{prev_expr} ;; {expr}", prev_refs | refs)
                else:
                    out[t] = (expr, refs)
    _MODULE_IMPORTS[mod_name] = imports
    _MODULE_ASSIGNS[mod_name] = out
    return out


def _module_imports(mod_name: str) -> dict[str, tuple[str, str]]:
    _module_assigns(mod_name)  # populates both caches
    return _MODULE_IMPORTS.get(mod_name, {})


def _referenced_names(src: str) -> set[str]:
    names: set[str] = set()
    try:
        tree = ast.parse(textwrap.dedent(src))
    except SyntaxError:
        return names
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            names.add(node.id)
        elif isinstance(node, ast.ImportFrom):
            for a in node.names:
                names.add(a.asname or a.name)
    return names


def _imports_of(src: str, pkg: str) -> list[tuple[str, str, str]]:
    """(resolved source module, original name, local name) for every
    package `from X import y` in ``src`` — module-level AND
    function-level. Function-level imports never land in
    ``__globals__``, and module-level ones bind the VALUE, not its
    origin; both made the closure blind to edits in the defining module
    (an edit to operators/dedup.phash_near_dup_pairs did not move
    image_phash_near_dup's fingerprint, and an edit to an imported
    constant like tpch_shared.D6 did not move its importers')."""
    out: list[tuple[str, str, str]] = []
    try:
        tree = ast.parse(textwrap.dedent(src))
    except SyntaxError:
        return out
    for node in ast.walk(tree):
        if not isinstance(node, ast.ImportFrom):
            continue
        mod = node.module or ""
        if node.level:  # relative import: resolve against the package
            base = pkg.split(".") if pkg else []
            base = base[: len(base) - (node.level - 1)] if node.level > 1 else base
            mod = ".".join(base + ([mod] if mod else []))
        if not mod.startswith(PKG):
            continue
        for a in node.names:
            out.append((mod, a.name, a.asname or a.name))
    return out


def _collect(obj, parts: list[str], seen: set, depth: int = 0) -> None:
    """Append fingerprint material for one referenced object and
    recurse through package callables (bounded depth — the engine call
    graph is shallow; 6 covers every plans -> operators -> functions
    chain with room)."""
    key = id(obj)
    if key in seen or depth > 6:
        return
    seen.add(key)
    if isinstance(obj, types.ModuleType):
        if obj.__name__.startswith(PKG) and getattr(obj, "__file__", None):
            try:
                parts.append(open(obj.__file__).read())
            except OSError:
                pass
        return
    mod = getattr(obj, "__module__", None)
    if not (mod and str(mod).startswith(PKG)):
        return
    try:
        src = inspect.getsource(obj)
    except (OSError, TypeError):
        return
    parts.append(src)
    g = getattr(obj, "__globals__", None)
    if g is None:  # class: fingerprint methods' referenced globals too
        g = vars(sys.modules.get(mod, types.ModuleType("_"))) if mod in sys.modules else {}
    for name in sorted(_referenced_names(src)):
        if name not in g:
            continue
        ref = g[name]
        if isinstance(ref, types.ModuleType) or callable(ref):
            _collect(ref, parts, seen, depth + 1)
        elif isinstance(ref, _DATA_TYPES):
            _collect_data(name, g, parts, seen, depth + 1)
    # Function-level `from pkg.x import y` bindings never appear in
    # __globals__ — resolve them against the defining module directly.
    pkg = getattr(sys.modules.get(mod), "__package__", "") or ""
    for src_mod, orig, _local in _imports_of(src, pkg):
        m = _module(src_mod)
        if m is None:
            continue
        ref = getattr(m, orig, None)
        if ref is None:
            # `from pkg.sources import wire_sink` imports a SUBMODULE —
            # the parent package only grows that attribute once the
            # submodule is loaded, so resolve it as a module directly
            # (load-state-independence again).
            ref = _module(f"{src_mod}.{orig}", probe=True)
        if ref is None:
            continue
        if isinstance(ref, types.ModuleType) or callable(ref):
            _collect(ref, parts, seen, depth + 1)
        elif isinstance(ref, _DATA_TYPES):
            _collect_data(orig, vars(m), parts, seen, depth + 1)


def _collect_data(name: str, g: dict, parts: list[str], seen: set, depth: int) -> None:
    """Fold a referenced data global by its top-level source-assignment
    text (process-state-robust — see _module_assigns), recursing through
    the names that assignment expression itself references so derived
    constants (`LIMIT = BASE * 2`) still move when their inputs move."""
    if depth > 6:
        return
    mod_name = g.get("__name__", "")
    key = (mod_name, name)
    if key in seen:
        return
    seen.add(key)
    info = _module_assigns(mod_name).get(name)
    if info is None:
        imp = _module_imports(mod_name).get(name)
        if imp is not None:
            # `from pkg.x import CONST [as name]`: track the DEFINING
            # module's assignment, not a local one (an edit to an
            # imported protocol constant must stale every importer)
            src_mod, orig = imp
            m = _module(src_mod)
            if m is not None:
                _collect_data(orig, vars(m), parts, seen, depth + 1)
                return
        # injected/built at runtime — process state, a stable marker
        parts.append(f"{name}=<no-toplevel-assign>")
        return
    expr, refs = info
    parts.append(f"{name}:={expr}")
    for rname in sorted(refs):
        if rname == name or rname not in g:
            continue
        ref = g[rname]
        if isinstance(ref, types.ModuleType) or callable(ref):
            _collect(ref, parts, seen, depth + 1)
        elif isinstance(ref, _DATA_TYPES):
            _collect_data(rname, g, parts, seen, depth + 1)


def query_fingerprint(name: str, fn, oracle: str | None) -> str:
    parts: list[str] = [name, oracle or "<rows-only>"]
    seen: set = set()
    _collect(fn, parts, seen)
    return hashlib.sha256("\n\x00".join(parts).encode()).hexdigest()


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True
    ).stdout.strip()


def evidence_rounds() -> dict[str, int]:
    """Newest round with a green driver row, per query."""
    out: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        for name, row in json.load(open(path)).items():
            ok = bool(row.get("hash_match") or row.get("rows_match")) and not row.get("err")
            if ok and rnd >= out.get(name, -1):
                out[name] = rnd
    return out


def compute(assume_round: int | None = None) -> dict:
    """assume_round: treat the first 50 queries() entries (the staged
    sweep window) as verified in that round — used to pre-stage the
    NEXT round's queue before the driver's CORRECTNESS file exists."""
    import __spark_entry__ as entry

    qs, osql = entry.queries(), entry.oracle_sql()
    baseline = json.load(open(FP_PATH)) if os.path.exists(FP_PATH) else {}
    ev = evidence_rounds()
    if assume_round is not None:
        for name in list(qs)[:50]:
            ev[name] = max(ev.get(name, assume_round), assume_round)
    report: dict = {"stale": [], "never_checked": [], "fresh": []}
    fps: dict[str, str] = {}
    for name, fn in qs.items():
        fp = query_fingerprint(name, fn, osql.get(name))
        fps[name] = fp
        rnd = ev.get(name)
        if rnd is None:
            report["never_checked"].append({"query": name})
            continue
        rec = {"query": name, "evidence_round": rnd}
        base = baseline.get(name)
        if base is None or base.get("fp") != fp:
            rec["verified_at"] = base.get("verified") if base else None
            report["stale"].append(rec)
        else:
            rec["verified_at"] = base.get("verified")
            report["fresh"].append(rec)
    report["stale"].sort(key=lambda r: (r["evidence_round"], r["query"]))
    report["fresh"].sort(key=lambda r: (r["evidence_round"], r["query"]))
    report["queue"] = (
        [r["query"] for r in report["never_checked"]]
        + [r["query"] for r in report["stale"]]
        + [r["query"] for r in report["fresh"]]
    )
    report["_fps"] = fps
    return report


def _flag_value(flag: str) -> str:
    i = sys.argv.index(flag)
    if i + 1 >= len(sys.argv) or sys.argv[i + 1].startswith("--"):
        sys.exit(f"usage: {flag} requires a value")
    return sys.argv[i + 1]


def main() -> None:
    assume = None
    if "--assume-round" in sys.argv:
        assume = int(_flag_value("--assume-round"))
    report = compute(assume_round=assume)
    fps = report.pop("_fps")
    if "--check" in sys.argv:
        # End-of-session tripwire (r7 verdict task 3): the r7 snapshot
        # commit swept in post-sweep code edits, shipping a baseline
        # that no longer matched the tree. Run this before idling; a
        # non-zero exit means "full sweep + --record (+ queue regen)
        # before you stop". A never-checked query is acceptable ONLY
        # while staged inside the driver's 50-query window (it gets its
        # first row next driver run); outside the window it would age
        # silently.
        import __spark_entry__ as entry

        window = set(list(entry.queries())[:50])
        stale = [r["query"] for r in report["stale"]]
        never = [
            r["query"]
            for r in report["never_checked"]
            if r["query"] not in window
        ]
        if stale or never:
            print(
                json.dumps(
                    {"ok": False, "stale": stale, "never_checked_unstaged": never}
                )
            )
            sys.exit(1)
        print(json.dumps({"ok": True, "fresh": len(report["fresh"])}))
        return
    if "--record" in sys.argv:
        label = f"full-sweep@{_git('rev-parse', '--short', 'HEAD')}"
        if "--label" in sys.argv:
            label = _flag_value("--label")
        data = {name: {"fp": fp, "verified": label} for name, fp in fps.items()}
        with open(FP_PATH, "w") as f:
            json.dump(data, f, indent=1, sort_keys=True)
        print(f"recorded {len(data)} fingerprints -> {FP_PATH} ({label})")
        return
    text = json.dumps(report, indent=2)
    if "--json" in sys.argv:
        with open(_flag_value("--json"), "w") as f:
            f.write(text)
    print(text)


if __name__ == "__main__":
    main()
