"""Physical-plan inspection helpers.

The reference hand-wires its physical strategy (channel topology,
main.go:44-256) so its performance properties are visible in the code;
on Spark they live in Catalyst's chosen plan instead.  These helpers
make those properties assertable, and tests/test_plans.py pins the
load-bearing ones (SURVEY.md §4.1): filter pushdown into parquet scans,
nested-column pruning, broadcast of small join sides, partial (map-side)
aggregation, and shuffle counts.  A regression that silently adds a
shuffle or drops a pushdown fails CI rather than surfacing at 100 TB.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def count_exchanges(df: DataFrame) -> int:
    """Shuffle boundaries: numbered Exchange nodes in the formatted
    plan (the tree header repeats names, so count detail entries)."""
    return len(re.findall(r"^\(\d+\) Exchange", formatted_plan(df), re.MULTILINE))


def count_generates(df: DataFrame) -> int:
    """Generate (explode) nodes in the formatted plan — numbered detail
    entries only, mirroring count_exchanges.  Guards the
    InferFiltersFromGenerate duplication trap: a plain explode over a
    computed array re-inlines the whole expression into a pushed
    size()>0 filter, doubling the Generate count."""
    return len(re.findall(r"^\(\d+\) Generate", formatted_plan(df), re.MULTILINE))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df)


def pushed_filters(df: DataFrame) -> str:
    m = re.search(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df))
    return m.group(1) if m else ""


def read_schema(df: DataFrame) -> str:
    m = re.search(r"ReadSchema: (.*)", formatted_plan(df))
    return m.group(1) if m else ""


def partition_filters(df: DataFrame) -> str:
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", formatted_plan(df))
    return m.group(1) if m else ""


def codegen_stage_count(df: DataFrame) -> int:
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", formatted_plan(df))))


def has_partial_aggregation(df: DataFrame) -> bool:
    """True when the plan carries map-side partial aggregates
    (``partial_``-prefixed functions before the exchange)."""
    return "partial_" in formatted_plan(df)
