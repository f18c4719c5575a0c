"""Emit the driver-priority prefix: queries changed since their last
driver attestation (VERDICT r6 task #2).

The grading driver's per-round correctness run is capped (~50 registry
entries), so ``registry._PRIORITY`` decides which queries get a fresh
CORRECTNESS row each round. Round 6 showed the failure mode of hand-curating
that list: two queries REWRITTEN in r6 (``join_basket_cooccurrence``,
``dedup_substring_spans``) kept r4/r5 attestation rows because the list
rotated stalest-first instead of changed-first. This tool mechanizes the
rule the verdict asked for: **any query whose defining module — or any
wd2sql_spark module that module (transitively) imports — changed in git
after the query's latest driver CORRECTNESS row must run first.**

Granularity is the MODULE, not the function: a query's semantics live
partly in the operator layer (r7 example: ``dedup_simhash``'s banding knob
is computed in ``operators/dedup.py``, two modules away from its
``@query`` site), so the import closure is the honest change scope. Pure
plumbing modules that never carry query semantics (session bootstrap,
caches, the registry itself) are excluded to keep the closure from
flagging the whole registry on an infra touch; ``_determinism`` and every
operator/ETL/sink module stay in scope.

Timestamps come from git: a module's change time is its last commit touch
(working-tree-dirty counts as "changed now"); a query's attestation time is
the commit touch of the CORRECTNESS_r{N}.json holding its latest row.
Never-attested queries are always flagged.

Usage:
    python tools/gen_priority.py            # print flagged names, one/line
    python tools/gen_priority.py --explain  # with module + round evidence

``tests/test_priority.py`` fails if a flagged query is missing from the
front of ``registry._PRIORITY``, so a mid-round module edit forces the
priority list (and hence the next driver run) to cover it.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "wd2sql_spark")

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

_IMPORT_RE = re.compile(
    r"^\s*(?:from\s+(wd2sql_spark(?:\.\w+)*)\s+import\s+([\w, ]+)"
    r"|import\s+(wd2sql_spark(?:\.\w+)*))",
    re.M,
)


def _module_file(mod: str) -> str | None:
    path = os.path.join(REPO, *mod.split(".")) + ".py"
    if os.path.exists(path):
        return path
    init = os.path.join(REPO, *mod.split("."), "__init__.py")
    return init if os.path.exists(init) else None


def _imports_of(mod: str) -> set[str]:
    """wd2sql_spark modules imported by ``mod`` — module-level AND
    function-local imports (several queries import the operator layer
    inside the function body)."""
    path = _module_file(mod)
    if path is None:
        return set()
    with open(path) as f:
        src = f.read()
    out: set[str] = set()
    for m in _IMPORT_RE.finditer(src):
        if m.group(3):
            out.add(m.group(3))
        elif m.group(1):
            base = m.group(1)
            out.add(base)
            # `from wd2sql_spark.operators import dedup as D` imports a
            # MODULE under the package: resolve each name to a module if
            # one exists (names that are functions/classes resolve to None
            # and are skipped).
            for name in m.group(2).split(","):
                name = name.strip().split(" as ")[0].strip()
                if name and _module_file(f"{base}.{name}"):
                    out.add(f"{base}.{name}")
    return out


def _closure(mod: str, cache: dict[str, set[str]]) -> set[str]:
    if mod in cache:
        return cache[mod]
    cache[mod] = set()  # cycle guard
    seen = {mod}
    for dep in _imports_of(mod):
        if dep in INFRA:
            continue
        seen |= _closure(dep, cache)
    cache[mod] = seen
    return seen


def _git_ts(path: str) -> int:
    """Last commit touch of ``path``; a dirty working tree counts as
    changed-now (the edit WILL be part of the round the driver grades)."""
    rel = os.path.relpath(path, REPO)
    dirty = subprocess.run(
        ["git", "status", "--porcelain", "--", rel],
        cwd=REPO, capture_output=True, text=True,
    ).stdout.strip()
    if dirty:
        return 2**62
    out = subprocess.run(
        ["git", "log", "-1", "--format=%ct", "--", rel],
        cwd=REPO, capture_output=True, text=True,
    ).stdout.strip()
    return int(out) if out else 2**62  # untracked new module → changed-now


def _attestations() -> dict[str, tuple[int, int]]:
    """query name → (latest round with a driver row, that file's git ts)."""
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


def flagged_queries() -> list[dict]:
    """Queries whose change closure postdates their attestation, sorted
    stalest-attestation-first (never-attested first of all)."""
    sys.path.insert(0, REPO)
    from wd2sql_spark.queries import load_all_modules
    from wd2sql_spark.queries.registry import REGISTRY

    load_all_modules()
    attested = _attestations()

    # name → defining module: the registry's fn may be a plan_cached
    # wrapper defined in registry.py, so locate the @query("name" site.
    defmod: dict[str, str] = {}
    for path in glob.glob(os.path.join(PKG, "queries", "*.py")):
        with open(path) as f:
            src = f.read()
        mod = "wd2sql_spark.queries." + os.path.splitext(os.path.basename(path))[0]
        for m in re.finditer(r"@query\(\s*['\"]([a-z0-9_]+)['\"]", src):
            defmod[m.group(1)] = mod

    cache: dict[str, set[str]] = {}
    ts_cache: dict[str, int] = {}

    def mod_ts(mod: str) -> int:
        if mod not in ts_cache:
            path = _module_file(mod)
            ts_cache[mod] = _git_ts(path) if path else 0
        return ts_cache[mod]

    out = []
    for name in REGISTRY:
        mod = defmod.get(name)
        if mod is None:
            out.append({"name": name, "round": -1, "why": "no @query site found"})
            continue
        att = attested.get(name)
        scope = _closure(mod, cache)
        newest_mod = max(scope, key=mod_ts)
        if att is None:
            out.append({"name": name, "round": -1, "why": "never attested"})
        elif mod_ts(newest_mod) > att[1]:
            out.append(
                {
                    "name": name,
                    "round": att[0],
                    "why": f"{newest_mod} changed after r{att[0]} attestation",
                }
            )
    out.sort(key=lambda d: (d["round"], d["name"]))
    return out


if __name__ == "__main__":
    explain = "--explain" in sys.argv
    for row in flagged_queries():
        if explain:
            print(f"{row['name']}  [last driver row: r{row['round']}]  {row['why']}")
        else:
            print(row["name"])
