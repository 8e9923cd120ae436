"""Plan inspection helpers — the engine's "did Catalyst do the right thing"
toolkit, used by tests to assert scale properties (SURVEY.md §4):

- filters reached the Parquet scan (``PushedFilters``);
- column pruning happened (``ReadSchema`` is narrow);
- the small side of a join was broadcast;
- the hot path is inside WholeStageCodegen.

Nothing here changes plans; it parses ``explain('formatted')`` output so
assertions fail loudly when a future change regresses the physical plan.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the Parquet scan."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema entries — what each scan actually reads (column pruning)."""
    return [m.group(1) for m in re.finditer(r"ReadSchema: (struct<[^\n]*)", formatted_plan(df))]


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df)


def has_shuffle(df: DataFrame) -> bool:
    return "Exchange" in formatted_plan(df)


def codegen_stage_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (fewer per operator = wider fusion).

    Formatted explain tags codegen'd operators with ``[codegen id : N]``."""
    plan = formatted_plan(df)
    ids = set(re.findall(r"codegen id : (\d+)", plan))
    ids.update(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
    return len(ids)
