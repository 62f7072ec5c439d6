"""Physical plan inspection: assert scale properties, don't guess them.

These helpers read ``df.explain('formatted')`` output so tests can pin
down the plans that matter at 100TB: dimension joins must broadcast
(never shuffle the fact table), scans must push filters/prune columns,
and hot expressions must stay inside whole-stage codegen.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def shuffle_count(df: DataFrame) -> int:
    """Number of exchange (shuffle) operators in the physical plan.
    ('simple' mode keeps Exchange and its partitioning on one line;
    'formatted' mode splits them.)"""
    plan = explain_str(df, "simple")
    return len(re.findall(r"\bExchange (?:hash|range)partitioning", plan))


def has_pushed_filters(df: DataFrame) -> bool:
    plan = explain_str(df)
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    return bool(m and m.group(1).strip())


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Count of whole-stage-codegen spans in the FINAL adaptive plan.

    Under AQE, codegen stages only exist after execution — so this
    executes the plan (noop sink) and then reads the final plan string.
    """
    df.collect()
    plan = explain_str(df, "simple")
    return len(set(re.findall(r"\*\((\d+)\) ", plan)))
