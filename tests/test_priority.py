"""The driver-priority list must front-load changed-since-attestation
queries (VERDICT r6 task #2).

``tools/gen_priority.py`` is the mechanism: it flags every registered
query whose defining module (or a non-infra module in its import closure)
changed in git after the query's latest driver CORRECTNESS row. This test
is the forcing function — edit a query module mid-round and the test fails
until ``registry._PRIORITY`` covers the flagged queries, so the next
driver run re-proves what changed instead of rotating by staleness alone.

If this fails at round start (a new CORRECTNESS_r{N}.json just shrank the
flag set), regenerate: ``python tools/gen_priority.py`` and rebuild the
(c) section of ``registry._PRIORITY`` from its output.
"""

from __future__ import annotations

# The driver's correctness run is capped at ~50 registry entries.
DRIVER_CAP = 50
# A few head slots may be hand-pinned out of tool order (a brand-new query
# needing its first row, or a verdict-named must-run).
HAND_PIN_SLACK = 8


def test_priority_front_loads_changed_queries():
    from tools.gen_priority import flagged_queries
    from wd2sql_spark.queries.registry import _PRIORITY

    flagged = [d["name"] for d in flagged_queries()]
    k = min(DRIVER_CAP, len(flagged))
    head = set(_PRIORITY[: k + HAND_PIN_SLACK])
    missing = [n for n in flagged[:k] if n not in head]
    assert not missing, (
        f"{len(missing)} changed-since-attestation queries are not in the "
        f"first {k + HAND_PIN_SLACK} _PRIORITY slots: {missing[:10]} — "
        "regenerate the list with `python tools/gen_priority.py`"
    )


def test_priority_wastes_no_slots_while_flagged_queue_overflows():
    """While more queries are flagged than the driver can attest in one
    round, every head slot must go to a flagged query."""
    from tools.gen_priority import flagged_queries
    from wd2sql_spark.queries.registry import _PRIORITY

    flagged = {d["name"] for d in flagged_queries()}
    if len(flagged) < DRIVER_CAP:
        return  # queue fits; stalest-first padding is fine
    wasted = [n for n in _PRIORITY[:DRIVER_CAP] if n not in flagged]
    assert not wasted, (
        f"_PRIORITY head spends driver slots on already-attested queries "
        f"while {len(flagged)} flagged ones wait: {wasted[:10]}"
    )


def test_priority_names_are_registered():
    from wd2sql_spark.queries import load_all_modules
    from wd2sql_spark.queries.registry import _PRIORITY

    registry = load_all_modules()
    unknown = [n for n in _PRIORITY if n not in registry]
    assert not unknown, f"_PRIORITY names not in registry: {unknown}"
