"""Emit the driver-priority prefix: queries whose COMPUTATION changed since
their last driver attestation (VERDICT r6 task #2, narrowed per r7 task #2).

The grading driver's per-round correctness run is capped (~50 registry
entries), so ``registry._PRIORITY`` decides which queries get a fresh
CORRECTNESS row each round. Two generations of this tool:

- r7 (timestamps): flag any query whose defining module — or any
  wd2sql_spark module in its transitive import closure — has a git change
  newer than the CORRECTNESS file holding the query's latest row. Sound but
  coarse: one ``operators/dedup.py`` touch flagged ~40 queries whose plans
  never moved, overflowing the driver cap (81 flagged at r7 end).
- r8 (plan fingerprints, this version): flag on ``tools/plan_fp.py``'s
  fingerprint — canonicalized optimized plan + output schema + scanned
  inputs + oracle SQL + Python-eval-module ASTs — compared against the
  snapshot recorded at the query's latest attestation
  (``tools/plan_fps.json``). A comment-only or unrelated-query edit moves
  no fingerprint and flags nothing; a banding-knob change moves the literal
  in every consumer's plan and flags exactly the consumers
  (tests/test_priority.py proves both). Queries with no snapshot entry for
  their latest attestation fall back to the r7 timestamp rule until their
  next attestation records one.

Round-start ritual (run BEFORE touching any code, right after the driver's
artifact commit lands):

    python tools/gen_priority.py --refresh   # snapshot fps for newly
                                             # attested queries (valid
                                             # because the working tree IS
                                             # the tree the driver ran)
    python tools/gen_priority.py             # then rebuild _PRIORITY's
                                             # head from this output

Timestamps (fallback path only) come from git; an UNTRACKED artifact or
module uses its mtime, so the judged-but-uncommitted window between the
driver writing CORRECTNESS_r{N}.json and the artifact commit cannot fail a
fresh checkout (VERDICT r7 "what's wrong" #1).

Usage:
    python tools/gen_priority.py             # print flagged names, one/line
    python tools/gen_priority.py --explain   # with evidence
    python tools/gen_priority.py --refresh   # update tools/plan_fps.json
"""

from __future__ import annotations

import ast
import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "wd2sql_spark")
SNAPSHOT = os.path.join(REPO, "tools", "plan_fps.json")

# Modules that carry no query semantics: a change here must be covered by
# the test battery / oracle sweeps, not by burning the driver's capped
# correctness slots on every registered query.
INFRA = {
    "wd2sql_spark.session",
    "wd2sql_spark.session_cache",
    "wd2sql_spark.catalog",
    "wd2sql_spark.queries.registry",
    "wd2sql_spark.queries",
    "wd2sql_spark",
}


def module_file(mod: str) -> str | None:
    path = os.path.join(REPO, *mod.split(".")) + ".py"
    if os.path.exists(path):
        return path
    init = os.path.join(REPO, *mod.split("."), "__init__.py")
    return init if os.path.exists(init) else None


def _imports_of(mod: str) -> set[str]:
    """wd2sql_spark modules imported by ``mod``, via the stdlib ``ast``
    walk (ADVICE r7: the old line-regex missed parenthesized multi-line
    ``from x import (a,\\n b)`` forms, silently dropping closure edges).
    Function-local imports are included — several queries import the
    operator layer inside the function body."""
    path = module_file(mod)
    if path is None:
        return set()
    with open(path) as f:
        src = f.read()
    try:
        tree = ast.parse(src)
    except SyntaxError:
        return set()
    out: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for alias in node.names:
                if alias.name.startswith("wd2sql_spark"):
                    out.add(alias.name)
        elif isinstance(node, ast.ImportFrom) and node.module:
            base = node.module
            if node.level:  # relative import: resolve against this package
                pkg_parts = mod.split(".")[: -node.level]
                base = ".".join(pkg_parts + [node.module])
            if not base.startswith("wd2sql_spark"):
                continue
            out.add(base)
            # `from wd2sql_spark.operators import dedup as D` imports a
            # MODULE under the package: resolve each name to a module if
            # one exists (function/class names resolve to None, skipped).
            for alias in node.names:
                if module_file(f"{base}.{alias.name}"):
                    out.add(f"{base}.{alias.name}")
    return out


def closure_of(mod: str, cache: dict[str, set[str]]) -> set[str]:
    """Transitive non-infra import closure, BFS so a module participating
    in an import cycle still gets its complete closure (ADVICE r7: the old
    recursive memo cached a cycle member's partial set)."""
    if mod in cache:
        return cache[mod]
    seen = {mod}
    stack = [mod]
    while stack:
        for dep in _imports_of(stack.pop()):
            if dep not in INFRA and dep not in seen:
                seen.add(dep)
                stack.append(dep)
    cache[mod] = seen
    return seen


def _git_ts(path: str) -> int:
    """Last commit touch of ``path``. A dirty TRACKED file counts as
    changed-now (the edit WILL be part of the round the driver grades); an
    untracked file uses its mtime — the driver's CORRECTNESS_r{N}.json is
    written (and judged) before the artifact commit lands, and that window
    must not flag freshly-attested queries on a fresh checkout."""
    rel = os.path.relpath(path, REPO)
    dirty = subprocess.run(
        ["git", "status", "--porcelain", "--", rel],
        cwd=REPO, capture_output=True, text=True,
    ).stdout.strip()
    if dirty.startswith("??"):
        return int(os.path.getmtime(path))
    if dirty:
        return 2**62
    out = subprocess.run(
        ["git", "log", "-1", "--format=%ct", "--", rel],
        cwd=REPO, capture_output=True, text=True,
    ).stdout.strip()
    return int(out) if out else int(os.path.getmtime(path))


def attestations() -> dict[str, tuple[int, int]]:
    """query name → (latest round with a driver row, that file's ts)."""
    latest: dict[str, tuple[int, int]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnum = int(m.group(1))
        ts = _git_ts(path)
        with open(path) as f:
            for name in json.load(f):
                prev = latest.get(name)
                if prev is None or rnum > prev[0]:
                    latest[name] = (rnum, ts)
    return latest


def defining_modules() -> dict[str, str]:
    """query name → module holding its @query site (the registry's fn may
    be a plan_cached wrapper defined in registry.py)."""
    defmod: dict[str, str] = {}
    for path in glob.glob(os.path.join(PKG, "queries", "*.py")):
        with open(path) as f:
            src = f.read()
        mod = "wd2sql_spark.queries." + os.path.splitext(os.path.basename(path))[0]
        for m in re.finditer(r"@query\(\s*['\"]([a-z0-9_]+)['\"]", src):
            defmod[m.group(1)] = mod
    return defmod


def load_snapshot() -> dict[str, dict]:
    if not os.path.exists(SNAPSHOT):
        return {}
    with open(SNAPSHOT) as f:
        return json.load(f)


def flagged_queries(current_fps: dict[str, str] | None = None) -> list[dict]:
    """Queries needing a fresh driver row, stalest-attestation-first
    (never-attested first of all).

    ``current_fps``: precomputed ``tools/plan_fp.py`` fingerprints. When
    omitted, a SparkSession is created lazily only if some query actually
    has a snapshot entry to compare against (fallback-path queries never
    need one).
    """
    sys.path.insert(0, REPO)
    from wd2sql_spark.queries import load_all_modules
    from wd2sql_spark.queries.registry import REGISTRY

    load_all_modules()
    attested = attestations()
    snapshot = load_snapshot()
    defmod = defining_modules()

    # Which names can use the fingerprint path: snapshot round == latest
    # attested round (the fp was recorded against the tree that attestation
    # graded). A stale snapshot (older round) means the ritual was skipped;
    # fall back to timestamps until --refresh runs.
    fp_names = {
        n for n, att in attested.items()
        if n in snapshot and snapshot[n]["round"] == att[0] and n in REGISTRY
    }
    if fp_names and current_fps is None:
        from tools.plan_fp import compute_fps
        from wd2sql_spark.session import get_spark

        current_fps = compute_fps(get_spark("gen-priority"), sorted(fp_names))
    current_fps = current_fps or {}

    cache: dict[str, set[str]] = {}
    ts_cache: dict[str, int] = {}

    def mod_ts(mod: str) -> int:
        if mod not in ts_cache:
            path = module_file(mod)
            ts_cache[mod] = _git_ts(path) if path else 0
        return ts_cache[mod]

    out = []
    for name in REGISTRY:
        att = attested.get(name)
        if att is None:
            out.append({"name": name, "round": -1, "why": "never attested"})
            continue
        if name in fp_names and name in current_fps:
            if current_fps[name] != snapshot[name]["fp"]:
                out.append(
                    {
                        "name": name,
                        "round": att[0],
                        "why": f"plan fingerprint moved since r{att[0]} attestation",
                    }
                )
            continue
        mod = defmod.get(name)
        if mod is None:
            out.append({"name": name, "round": -1, "why": "no @query site found"})
            continue
        scope = closure_of(mod, cache)
        newest_mod = max(scope, key=mod_ts)
        if mod_ts(newest_mod) > att[1]:
            out.append(
                {
                    "name": name,
                    "round": att[0],
                    "why": f"{newest_mod} changed after r{att[0]} attestation "
                    "(no fp snapshot — timestamp fallback)",
                }
            )
    out.sort(key=lambda d: (d["round"], d["name"]))
    return out


def refresh_snapshot() -> dict[str, dict]:
    """Record fingerprints for queries attested in a round newer than
    their snapshot entry. ONLY valid when the working tree's query code is
    the tree the driver graded (i.e. at round start, before editing)."""
    sys.path.insert(0, REPO)
    from tools.plan_fp import compute_fps
    from wd2sql_spark.session import get_spark

    attested = attestations()
    snapshot = load_snapshot()
    todo = sorted(
        n for n, att in attested.items()
        if n not in snapshot or snapshot[n]["round"] < att[0]
    )
    if todo:
        fps = compute_fps(get_spark("gen-priority-refresh"), todo)
        for n in todo:
            if n in fps:
                snapshot[n] = {"fp": fps[n], "round": attested[n][0]}
        with open(SNAPSHOT, "w") as f:
            json.dump(snapshot, f, indent=1, sort_keys=True)
            f.write("\n")
    print(f"refreshed {len(todo)} snapshot entries → {SNAPSHOT}", file=sys.stderr)
    return snapshot


def emit_priority(cap: int = 50) -> None:
    """Print a ready-to-paste ``_PRIORITY`` tuple body: flagged queries in
    tool order, then stalest-attested padding up to ``cap`` — the
    round-start rebuild, mechanized end-to-end."""
    sys.path.insert(0, REPO)
    from wd2sql_spark.queries import load_all_modules

    reg = load_all_modules()
    flagged_rows = flagged_queries()
    flagged = [d["name"] for d in flagged_rows]
    att = attestations()
    # Intersect with the live registry: an attestation for a since-
    # deleted/renamed query must not be emitted (ADVICE r8 #3).
    pad = [
        n
        for _, n in sorted(
            (r, n) for n, (r, _) in att.items() if n not in flagged and n in reg
        )
    ][: max(0, cap - len(flagged))]
    print("_PRIORITY = (")
    print("    # flagged (tools/gen_priority.py order)")
    for d in flagged_rows:
        print(f'    "{d["name"]}",  # {d["why"]}')
    print("    # stalest-attested padding to the driver cap")
    for n in pad:
        print(f'    "{n}",  # r{att[n][0]}')
    print(")")


if __name__ == "__main__":
    if "--refresh" in sys.argv:
        refresh_snapshot()
        sys.exit(0)
    if "--emit-priority" in sys.argv:
        emit_priority()
        sys.exit(0)
    explain = "--explain" in sys.argv
    for row in flagged_queries():
        if explain:
            print(f"{row['name']}  [last driver row: r{row['round']}]  {row['why']}")
        else:
            print(row["name"])
