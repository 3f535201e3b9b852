"""Library operators (SURVEY.md §4.3) — no custom Catalyst rules needed;
each is a composition of DataFrame algebra that Catalyst can optimize."""

from polygon_daily_market_data_pipeline_spark.operators.dedupe import latest_by_key
from polygon_daily_market_data_pipeline_spark.operators.incremental import (
    invalidate_partitions,
    read_aggregate,
    refresh_aggregate,
    streaming_aggregate_sink,
)
from polygon_daily_market_data_pipeline_spark.operators.layout import (
    bloom_filter_options,
    zorder_write,
)
from polygon_daily_market_data_pipeline_spark.operators.merge import (
    insert_only_merge,
    merge_upsert,
)
from polygon_daily_market_data_pipeline_spark.operators.scd import (
    as_of,
    scd2_init,
    scd2_merge,
    scd2_store_init,
    scd2_store_merge,
    scd2_store_read,
)
from polygon_daily_market_data_pipeline_spark.operators.decontam import (
    contamination_hits,
    decontaminate,
    eval_ngram_set,
)
from polygon_daily_market_data_pipeline_spark.operators.versioned import (
    clone_table,
    drop_clone,
    commit_version,
    delete_version_keys,
    delete_version_vectors,
    delete_version_where,
    diff_versions,
    drop_partitions,
    materialize_dv,
    merge_version,
    optimize_compact,
    optimize_zorder,
    read_changes,
    replicate_changes,
    read_version,
    rollback,
    scan_version,
    scan_version_with_stats,
    update_version_vectors,
    update_version_where,
    vacuum,
    versioned_stream_sink,
)

__all__ = [
    "latest_by_key",
    "insert_only_merge",
    "merge_upsert",
    "invalidate_partitions",
    "read_aggregate",
    "refresh_aggregate",
    "streaming_aggregate_sink",
    "bloom_filter_options",
    "zorder_write",
    "as_of",
    "scd2_init",
    "scd2_merge",
    "scd2_store_init",
    "scd2_store_merge",
    "scd2_store_read",
    "contamination_hits",
    "decontaminate",
    "eval_ngram_set",
    "clone_table",
    "drop_clone",
    "commit_version",
    "optimize_zorder",
    "delete_version_keys",
    "delete_version_vectors",
    "delete_version_where",
    "diff_versions",
    "drop_partitions",
    "materialize_dv",
    "merge_version",
    "optimize_compact",
    "update_version_vectors",
    "update_version_where",
    "read_changes",
    "replicate_changes",
    "read_version",
    "rollback",
    "scan_version",
    "scan_version_with_stats",
    "vacuum",
    "versioned_stream_sink",
]
