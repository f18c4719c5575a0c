"""Property tests for the water-filling token-budget allocation
(queries/llm_selection.py::mix_token_budget_waterfill).

The Spark query and its DuckDB oracle are hash-checked against each other
by the oracle sweeps; what THEY cannot establish is that the closed form
(sort by cap/weight, prefix sums, running-AND saturation flag, frozen
remainder) computes the allocation the water-filling DEFINITION asks for.
Here the exact integer arithmetic of the query is replayed in pure Python
and compared against an independent fixed-point reference: repeatedly cap
every source whose weight-proportional share of the remaining budget
exceeds its cap, until no new source caps, then floor-allocate the rest.
Both must agree on the saturated set and on every allocation."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

E_MAX = 2


def isqrt_guarded(a: int) -> int:
    """floor(sqrt(a)) via the double sqrt + guard, exactly as both engines
    compute it (llm_selection.py / WATERFILL_ORACLE)."""
    s0 = int(math.floor(math.sqrt(float(a))))
    if (s0 + 1) * (s0 + 1) <= a:
        return s0 + 1
    if s0 * s0 > a:
        return s0 - 1
    return s0


def closed_form(tokens: dict[str, int], budget: int) -> dict[str, tuple[int, int]]:
    """The query's algorithm: {lang: (saturated, alloc)}."""
    rows = [(lang, a, isqrt_guarded(a), E_MAX * a) for lang, a in tokens.items()]
    rows.sort(key=lambda r: (r[3] / r[2], r[0]))  # cap/w double, tie on lang
    wtot = sum(r[2] for r in rows)
    pre_cap = pre_w = 0
    flags = []
    for _, _, w, cap in rows:
        f = cap * (wtot - pre_w) <= (budget - pre_cap) * w
        flags.append(f)
        pre_cap += cap
        pre_w += w
    is_sat, running = [], True
    for f in flags:
        running = running and f
        is_sat.append(running)
    sat_cap = sum(r[3] for r, s in zip(rows, is_sat) if s)
    sat_w = sum(r[2] for r, s in zip(rows, is_sat) if s)
    out = {}
    for (lang, _a, w, cap), s in zip(rows, is_sat):
        alloc = cap if s else (budget - sat_cap) * w // (wtot - sat_w)
        out[lang] = (int(s), alloc)
    return out


def fixed_point(tokens: dict[str, int], budget: int) -> dict[str, tuple[int, int]]:
    """Independent reference: iteratively cap any source whose
    proportional share of the REMAINING budget over the REMAINING weights
    meets its cap (cross-multiplied in exact integers), recompute until
    stable, then floor-allocate the uncapped."""
    w = {lang: isqrt_guarded(a) for lang, a in tokens.items()}
    cap = {lang: E_MAX * a for lang, a in tokens.items()}
    capped: set[str] = set()
    while True:
        rem_budget = budget - sum(cap[c] for c in capped)
        rem_w = sum(w[s] for s in tokens if s not in capped)
        newly = {
            s
            for s in tokens
            if s not in capped and rem_w > 0 and cap[s] * rem_w <= rem_budget * w[s]
        }
        if not newly:
            break
        capped |= newly
    rem_budget = budget - sum(cap[c] for c in capped)
    rem_w = sum(w[s] for s in tokens if s not in capped)
    return {
        s: (1, cap[s]) if s in capped else (0, rem_budget * w[s] // rem_w)
        for s in tokens
    }


@st.composite
def corpora(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    tokens = {
        f"l{i}": draw(st.integers(min_value=1, max_value=10_000_000)) for i in range(n)
    }
    total = sum(tokens.values())
    # budgets from starved (0.1x) to beyond all caps (3x)
    budget = draw(st.integers(min_value=max(total // 10, 1), max_value=3 * total))
    return tokens, budget


@settings(max_examples=300, deadline=None)
@given(corpora())
def test_closed_form_equals_fixed_point(case):
    tokens, budget = case
    assert closed_form(tokens, budget) == fixed_point(tokens, budget)


@settings(max_examples=300, deadline=None)
@given(corpora())
def test_allocation_invariants(case):
    tokens, budget = case
    out = closed_form(tokens, budget)
    total_alloc = sum(a for _, a in out.values())
    caps = {s: E_MAX * a for s, a in tokens.items()}
    # never exceed the budget, never exceed any cap; the flag IS the
    # at-cap condition (unsaturated ⇒ strictly below cap: the saturation
    # compare is ≤, so a share exactly at cap flags saturated)
    assert total_alloc <= budget
    for s, (sat, alloc) in out.items():
        assert 0 <= alloc <= caps[s]
        assert bool(sat) == (alloc == caps[s])
    # with any source unsaturated, the budget is exhausted up to the
    # flooring loss: sum(floor(R*.w/W*)) >= R* - n_unsat
    if not all(sat for sat, _ in out.values()):
        n_unsat = sum(1 for sat, _ in out.values() if not sat)
        assert budget - total_alloc < n_unsat
