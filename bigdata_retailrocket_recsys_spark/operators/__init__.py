from bigdata_retailrocket_recsys_spark.operators.sessionize import sessionize
from bigdata_retailrocket_recsys_spark.operators.windows import (
    lag_delta,
    latest_per_key,
    running_sum,
    topk_per_group,
)
from bigdata_retailrocket_recsys_spark.operators.joins import (
    anti,
    covis_pairs,
    pit_last_join,
    prefix_agg_join,
    salted_join,
    semi,
)
from bigdata_retailrocket_recsys_spark.operators.aggregates import (
    collect_ordered_seq,
    two_level_agg,
)
from bigdata_retailrocket_recsys_spark.operators.dedup import (
    content_digest_table,
    duplicated_spans_vs_corpus,
    incremental_exact_dedup,
    jaccard_pairs_vs_corpus,
    minhash_lsh_candidates_vs_corpus,
    contamination_check,
    embedding_cosine_pairs,
    exact_dedup,
    minhash_lsh_candidates,
    minhash_signatures_table,
    ngram_count_table,
    ngram_jaccard_pairs,
    shingle_table,
    simhash,
)
from bigdata_retailrocket_recsys_spark.operators.features import (
    feature_hash_index,
    pack_sequences,
    popularity_negative_samples,
    target_encode_oof,
)
from bigdata_retailrocket_recsys_spark.operators.splits import kfold_assign
from bigdata_retailrocket_recsys_spark.operators.text import (
    chunk_tokens,
    redact_patterns,
    token_repetition,
)
from bigdata_retailrocket_recsys_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_ivf,
    cosine_topk_ivf_at_rest,
    cosine_topk_lsh,
    ivf_write_at_rest,
    lsh_bucket,
)

__all__ = [
    "sessionize",
    "lag_delta",
    "latest_per_key",
    "running_sum",
    "topk_per_group",
    "anti",
    "covis_pairs",
    "pit_last_join",
    "prefix_agg_join",
    "salted_join",
    "semi",
    "collect_ordered_seq",
    "two_level_agg",
    "chunk_tokens",
    "contamination_check",
    "embedding_cosine_pairs",
    "exact_dedup",
    "redact_patterns",
    "token_repetition",
    "minhash_lsh_candidates",
    "minhash_lsh_candidates_vs_corpus",
    "minhash_signatures_table",
    "ngram_jaccard_pairs",
    "shingle_table",
    "simhash",
    "content_digest_table",
    "duplicated_spans_vs_corpus",
    "jaccard_pairs_vs_corpus",
    "ngram_count_table",
    "incremental_exact_dedup",
    "feature_hash_index",
    "pack_sequences",
    "popularity_negative_samples",
    "target_encode_oof",
    "kfold_assign",
    "cosine_topk",
    "cosine_topk_ivf",
    "cosine_topk_ivf_at_rest",
    "cosine_topk_lsh",
    "ivf_write_at_rest",
    "lsh_bucket",
]
