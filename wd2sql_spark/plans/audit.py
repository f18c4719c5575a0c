"""Physical-plan audit: make "explain and iterate" a regression test.

``plan_report(df)`` parses ``explain("formatted")`` output into the facts
that decide whether a plan survives a 100× scale-up:

- which filters were PUSHED to the parquet scan (vs evaluated post-scan)
- which columns each scan actually reads (column pruning)
- how many Exchanges (shuffles) vs BroadcastExchanges the plan has
- whether row-at-a-time Python evaluation (BatchEvalPython) snuck in

Tests assert budgets against these (tests/test_plan_audit.py), so a
regression that silently un-pushes a filter or adds a shuffle fails CI —
the plan itself is under test, not just the result rows.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanReport:
    shuffles: int = 0  # data-moving Exchange nodes (shuffle exchanges)
    broadcasts: int = 0  # BroadcastExchange nodes (small-side ship, no shuffle)
    scans: list[dict] = field(default_factory=list)  # per-scan pushed filters + read schema
    python_eval: bool = False  # row-at-a-time Python UDF in the plan
    pandas_eval: bool = False  # Arrow-batched (ArrowEvalPython / mapInPandas)
    codegen_spans: int = 0
    text: str = ""

    @property
    def pushed_filters(self) -> list[str]:
        return [f for s in self.scans for f in s["pushed"]]

    @property
    def read_columns(self) -> set[str]:
        return {c for s in self.scans for c in s["columns"]}


def _split_top_level(s: str) -> list[str]:
    """Split a filter list on commas not nested inside parentheses —
    ``EqualTo(r_name,EUROPE)`` is one filter, not two."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "," and depth == 0:
            if "".join(cur).strip():
                out.append("".join(cur).strip())
            cur = []
            continue
        depth += ch == "("
        depth -= ch == ")"
        cur.append(ch)
    if "".join(cur).strip():
        out.append("".join(cur).strip())
    return out


def explain_formatted(df: DataFrame) -> str:
    jdf = df._jdf
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return jdf.queryExecution().explainString(mode)


def plan_report(df: DataFrame) -> PlanReport:
    text = explain_formatted(df)
    rep = PlanReport(text=text)
    # Count UNIQUE node ids, not text occurrences: formatted explain
    # re-prints a shared subtree (an InMemoryRelation's build plan, a
    # reused exchange) once per consumer reference, all with the SAME node
    # ids — the subtree executes once, so occurrence-counting overstates
    # the real shuffle work (the prefix-filter join read 18 where only 5
    # distinct exchanges run; VERDICT r4 task #6). ReusedExchange nodes
    # are references, not executions, and are excluded outright.
    tree = text.split("\n\n")[0]
    rep.broadcasts = len(set(re.findall(r"(?<!Reused)BroadcastExchange \((\d+)\)", tree)))
    rep.shuffles = len(
        set(re.findall(r"(?<!Broadcast)(?<!Reused)Exchange \((\d+)\)", tree))
    )
    rep.python_eval = "BatchEvalPython" in text
    rep.pandas_eval = bool(re.search(r"ArrowEvalPython|FlatMapGroupsInPandas|MapInPandas", text))
    rep.codegen_spans = len(set(re.findall(r"WholeStageCodegen \((\d+)\)", text)))

    scan = None
    for line in text.splitlines():
        m = re.match(r"\(\d+\) Scan parquet\b", line.strip())
        if m:
            if scan:
                rep.scans.append(scan)
            scan = {"pushed": [], "columns": []}
            continue
        if scan is not None:
            pf = re.match(r"PushedFilters: \[(.*)\]", line.strip())
            if pf:
                scan["pushed"] = _split_top_level(pf.group(1))
            rs = re.match(r"ReadSchema: struct<(.*)>", line.strip())
            if rs:
                scan["columns"] = [c.split(":")[0] for c in rs.group(1).split(",") if c]
                rep.scans.append(scan)
                scan = None
    if scan:
        rep.scans.append(scan)
    return rep
