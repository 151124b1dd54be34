"""Physical-plan inspection helpers.

The reference hand-applies its physical optimizations (SURVEY §4); on Spark
the equivalents come from Catalyst, but only if the plan actually shows them.
These helpers turn `.explain` output into assertable properties so tests can
pin plan quality (pushed filters, column pruning, no cartesian products,
whole-stage codegen) instead of hoping for it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def plan_properties(df: DataFrame) -> dict:
    plan = formatted_plan(df)
    return {
        "has_cartesian": "CartesianProduct" in plan,
        "has_broadcast_join": "BroadcastHashJoin" in plan,
        "has_sort_merge_join": "SortMergeJoin" in plan,
        "has_shuffled_hash_join": "ShuffledHashJoin" in plan,
        "wholestage_codegen_spans": plan.count("WholeStageCodegen"),
        "pushed_filters": "PushedFilters: [" in plan and "PushedFilters: []" not in plan,
        "n_exchanges": plan.count("Exchange"),
        "plan": plan,
    }


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from the scan (column pruning check)."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for line in plan.splitlines():
        if "ReadSchema:" in line:
            schema = line.split("ReadSchema:", 1)[1].strip()
            inner = schema[schema.find("<") + 1 : schema.rfind(">")]
            for part in inner.split(","):
                name = part.split(":")[0].strip()
                if name:
                    cols.append(name)
    return cols
