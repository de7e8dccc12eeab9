from bigdata_retailrocket_recsys_spark.functions.vector import (
    cosine_similarity,
    dot,
    l2_norm,
    to_double_array,
)

__all__ = ["cosine_similarity", "dot", "l2_norm", "to_double_array"]
