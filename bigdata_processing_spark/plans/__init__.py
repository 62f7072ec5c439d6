"""Physical-plan inspection utilities — the engine's 'did Catalyst do
what we designed for' layer, used by the perf-regression tests."""

from bigdata_processing_spark.plans.inspect import (  # noqa: F401
    explain_str,
    has_broadcast_join,
    has_pushed_filters,
    shuffle_count,
    wholestage_codegen_spans,
)
