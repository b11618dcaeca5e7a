"""Transform operators — one module per reference transform (SURVEY §2.1).

T1 remap        → remap.remap / parse_url / parse_grok / parse_apache_common /
                  parse_json_fields / extract_text / split_errors
T2 filter       → filter.filter_events / filter_with_dropped
T3 route        → route.tag_routes / route.split
T4 sample       → sample.sample / sample_mod
T5 throttle     → throttle.throttle
T6 dedupe       → dedupe.dedupe
T7 reduce       → reduce.reduce_events
T8 aggregate    → aggregate.aggregate / sink_aggregate
T9 log_to_metric / T10 metric_to_log → metrics_conv
T11 tag_cardinality_limit → tag_cardinality
enrichment join → enrich.enrich / salted_join
T13 test_basic  → identity (pipeline-level)
T12 lua         → not ported; the pandas-UDF escape hatch covers the use case
"""

from vector_spark.operators.remap import (
    remap,
    parse_url,
    parse_grok,
    parse_apache_common,
    parse_json_fields,
    extract_text,
    split_errors,
)
from vector_spark.operators.filter import filter_events, filter_with_dropped
from vector_spark.operators.route import tag_routes, split, route_all_matches, UNMATCHED
from vector_spark.operators.sample import sample, sample_mod
from vector_spark.operators.throttle import throttle
from vector_spark.operators.dedupe import dedupe
from vector_spark.operators.reduce import reduce_events
from vector_spark.operators.aggregate import (
    aggregate,
    derive_stats,
    estimate_distinct,
    rollup_hypertable,
    rollup_merge_aggs,
    sink_aggregate,
)
from vector_spark.operators.metrics_conv import (
    log_to_metric,
    log_to_metric_distribution,
    log_to_metric_distribution_sketch,
    log_to_metric_histogram,
    log_to_metric_summary,
    metric_to_log,
)
from vector_spark.operators.map_events import map_events, register_map_hook
from vector_spark.operators.tag_cardinality import tag_cardinality_limit
from vector_spark.operators.enrich import (
    enrich,
    ip_range_enrich,
    salted_join,
    salted_repartition,
    validate_ip_ranges,
)
from vector_spark.operators.asof import asof_join
from vector_spark.operators.metric_rate import (
    counter_rate,
    delta_to_cumulative,
    exp_histogram_quantile,
    absent_windows,
    histogram_quantile,
    over_time,
    range_rate,
    sum_histograms,
)
from vector_spark.operators.multiline import assemble_multiline
from vector_spark.operators.slo import slo_burn_alerts
from vector_spark.operators.traces import service_graph, span_metrics, tail_sample, trace_rollup

__all__ = [
    "remap", "parse_url", "parse_grok", "parse_apache_common",
    "parse_json_fields", "extract_text", "split_errors",
    "filter_events", "filter_with_dropped",
    "tag_routes", "split", "route_all_matches", "UNMATCHED",
    "sample", "sample_mod", "throttle", "dedupe", "reduce_events",
    "aggregate", "rollup_hypertable", "rollup_merge_aggs", "sink_aggregate",
    "estimate_distinct", "derive_stats",
    "log_to_metric", "metric_to_log",
    "log_to_metric_summary", "log_to_metric_histogram", "log_to_metric_distribution",
    "log_to_metric_distribution_sketch",
    "map_events", "register_map_hook",
    "tag_cardinality_limit", "enrich", "salted_join", "salted_repartition",
    "ip_range_enrich", "validate_ip_ranges", "asof_join",
    "counter_rate", "delta_to_cumulative", "histogram_quantile",
    "exp_histogram_quantile", "range_rate", "sum_histograms", "over_time",
    "absent_windows", "slo_burn_alerts",
    "trace_rollup", "service_graph", "tail_sample", "span_metrics",
    "assemble_multiline",
]
