"""Physical-plan inspection helpers — the engine's own explain() tooling.

Used by tests (tests/test_plans.py) and by developers iterating on operator
plans per the scale checklist: is the filter pushed to the scan? is the small
side broadcast? how many exchanges does this plan pay for?
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def executed_plan_text(df: DataFrame) -> str:
    """Final (post-AQE) physical plan string."""
    return df._jdf.queryExecution().executedPlan().toString()


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges the plan pays for. The unit of merit for
    the merge path is 1 (repartition-by-bucket satisfies every downstream
    clustered distribution)."""
    return len(re.findall(r"Exchange hashpartitioning|Exchange rangepartitioning",
                          executed_plan_text(df)))


def pushed_filters(df: DataFrame) -> list[str]:
    out = []
    for ln in plan_text(df).splitlines():
        if "PushedFilters" in ln:
            inner = ln.split("PushedFilters:", 1)[1].strip().strip("[]")
            out.extend(x.strip() for x in inner.split(",") if x.strip())
    return out


def read_schema_columns(df: DataFrame) -> set[str]:
    cols: set[str] = set()
    for ln in plan_text(df).splitlines():
        if "ReadSchema" in ln:
            m = re.search(r"struct<(.*)>", ln)
            if m:
                cols.update(f.split(":")[0].strip() for f in m.group(1).split(","))
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_text(df)
