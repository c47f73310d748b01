"""Physical-plan inspection helpers — the engine's ".explain audit".

At 100 TB the physical plan IS the product: these helpers make plan
properties assertable in tests (tests/test_plans.py) and reportable
(tools/gen_plans_md.py -> PLANS.md) so regressions like a lost
broadcast, a duplicated Arrow UDF evaluation, or a filter that stopped
reaching the parquet scan fail CI instead of shipping.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def plan_report(df: DataFrame) -> dict:
    """Counts of the plan features that matter for scale."""
    p = physical_plan(df)
    return {
        "exchanges": len(re.findall(r"Exchange hashpartitioning", p)),
        "broadcast_exchanges": len(re.findall(r"BroadcastExchange", p)),
        "broadcast_hash_joins": len(re.findall(r"BroadcastHashJoin", p)),
        "sort_merge_joins": len(re.findall(r"SortMergeJoin", p)),
        "shuffled_hash_joins": len(re.findall(r"ShuffledHashJoin", p)),
        "nested_loop_joins": len(re.findall(r"NestedLoopJoin", p)),
        "arrow_evals": len(re.findall(r"ArrowEvalPython", p)),
        "windows": len(re.findall(r"\bWindow\b", p)),
        "sorts": len(re.findall(r"\bSort\b", p)),
        "hash_aggregates": len(re.findall(r"HashAggregate", p)),
        # AQE keeps the top plan adaptive; codegen spans show up as
        # "[codegen id : N]" annotations in the formatted plan
        "wholestage_codegen": len(set(re.findall(
            r"\[codegen id : (\d+)\]", formatted_plan(df)))),
        "pushed_filters": len(re.findall(r"PushedFilters: \[[^\]]", p)),
    }


def scan_read_schema(df: DataFrame) -> list[str]:
    """ReadSchema column lists of every file scan in the plan — the
    column-pruning check (a scan reading all columns for a narrow
    projection is a bug)."""
    p = physical_plan(df)
    return re.findall(r"ReadSchema: struct<([^>]*)>", p)
