from bigdata_retailrocket_recsys_spark.operators.sessionize import sessionize
from bigdata_retailrocket_recsys_spark.operators.windows import (
    lag_delta,
    latest_per_key,
    running_sum,
    topk_per_group,
)
from bigdata_retailrocket_recsys_spark.operators.joins import (
    covis_pairs,
    pit_last_join,
    prefix_agg_join,
)
from bigdata_retailrocket_recsys_spark.operators.aggregates import (
    collect_ordered_seq,
    two_level_agg,
)

__all__ = [
    "sessionize",
    "lag_delta",
    "latest_per_key",
    "running_sum",
    "topk_per_group",
    "covis_pairs",
    "pit_last_join",
    "prefix_agg_join",
    "collect_ordered_seq",
    "two_level_agg",
]
