"""Streaming corpus intake — the front half of the corpus pipeline
(quality gate + exact digest dedup) as a Structured Streaming job.

At 100 TB the corpus never arrives at once: crawl shards land as files
and the gate/dedup should run AT INGEST, not as a nightly rebuild. This
runner stages the documents table to session scratch, streams it back
file-by-file (``maxFilesPerTrigger`` — a real multi-micro-batch
lifecycle, the q_stream_late_drop staging pattern), quality-gates each
batch with the SAME narrow filter the batch pipeline uses, dedups on the
16-byte digest of NORMALIZED text (``dropDuplicates`` — seen-digest
state; production bounds it with dropDuplicatesWithinWatermark or the
persisted digest table of the incremental path), and maintains
per-domain accepted-document/token counts in complete mode.

Determinism for the oracle: dedup is keyed on (domain, digest) — which
PHYSICAL row survives a digest collision is arrival-order-dependent, but
the normalized token count is a function of the digest, so the
(domain, digest, n_tok) triple is deterministic and the per-domain
aggregate equals the batch DISTINCT → full DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_retailrocket_recsys_spark.operators.text import (
    normalize_text,
    quality_filter,
)
from bigdata_retailrocket_recsys_spark.sources.readers import load_table
from bigdata_retailrocket_recsys_spark.sources.scratch import session_scratch
from bigdata_retailrocket_recsys_spark.streaming import pin_streaming_confs


def run_streaming_corpus_intake(
    spark: SparkSession,
    sf_dir: str,
    *,
    eval_source: str = "src0",
    min_quality: float = 0.5,
    min_tokens: int = 5,
    sink_table: str = "bdrr_stream_corpus_intake",
) -> DataFrame:
    """Stage → stream → gate → digest-dedup → per-domain counts.

    Output: (domain, n_docs [distinct accepted digests], n_tokens
    [normalized whitespace tokens summed over those digests]).
    """
    pin_streaming_confs(spark)
    docs = load_table(spark, sf_dir, "documents")
    stage = session_scratch(spark, "corpus_intake_stage")
    docs.write.mode("overwrite").parquet(stage)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(stage)
    )
    base = stream.filter(
        F.col("doc_id").isNotNull() & F.col("text").isNotNull()
    ).filter(F.col("source").isNull() | (F.col("source") != eval_source))
    gated = quality_filter(
        base, text_col="text", min_quality=min_quality, min_tokens=min_tokens
    ).withColumn("__norm", normalize_text("text"))
    keyed = gated.select(
        F.col("source").alias("domain"),
        F.md5("__norm").alias("digest"),
        F.size(
            F.filter(F.split("__norm", " "), lambda t: t != F.lit(""))
        ).cast("bigint").alias("n_tok"),
    )
    out = (
        keyed.dropDuplicates(["domain", "digest"])
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
        )
    )
    q = (
        out.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink_table)
