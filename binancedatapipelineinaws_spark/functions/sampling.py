"""Training-data curation operators over `documents`: deterministic
sampling and token-budget packing (BASELINE.json north-star ops; absent
from the reference, which forwards every tick unsampled).

Both are designed for the 100 TB regime:

- sampling is a MAP-ONLY hash threshold — reproducible across engines,
  runs, and repartitionings, unlike `df.sample()` whose output depends
  on the seed AND the physical partitioning;
- budget packing shards each stratum so the running sum never serializes
  a whole language through one task: the per-(lang, shard) window is the
  unit of order, and the budget splits linearly across shards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from binancedatapipelineinaws_spark.functions.dedup import duck_hex32, hex32
from binancedatapipelineinaws_spark.registry import register
from binancedatapipelineinaws_spark.session import prepare
from binancedatapipelineinaws_spark.tables import load_table

# per-language sampling rates in basis points (how a curation pipeline
# up/down-weights sources); unlisted languages use the default
SAMPLE_RATES_BP = {"en": 5000, "de": 3000}
DEFAULT_RATE_BP = 2000

TOKEN_BUDGET = 2_800  # whitespace tokens per language (~6 avg docs/shard)
N_BUDGET_SHARDS = 8


def _sample_key(lang, doc_id):
    return hex32(F.concat(lang, F.lit(":"), doc_id.cast("string"))) % 10000


@register(
    "q_ext_stratified_sample",
    oracle=f"""
SELECT doc_id, lang, source
FROM documents
WHERE {duck_hex32("lang || ':' || CAST(doc_id AS VARCHAR)")} % 10000 <
      (CASE lang WHEN 'en' THEN {SAMPLE_RATES_BP['en']}
                 WHEN 'de' THEN {SAMPLE_RATES_BP['de']}
                 ELSE {DEFAULT_RATE_BP} END)
""",
)
def q_ext_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: keep a document iff the md5 of
    (lang, doc_id) falls under the stratum's rate.  Map-only (no
    shuffle, no state), stable under re-runs and repartitioning, and
    exactly reproducible in any engine — the property `df.sample()`
    cannot give a multi-engine pipeline."""
    prepare(spark)
    docs = load_table(spark, sf_dir, "documents")
    rate = F.when(F.col("lang") == "en", F.lit(SAMPLE_RATES_BP["en"])).when(
        F.col("lang") == "de", F.lit(SAMPLE_RATES_BP["de"])
    ).otherwise(F.lit(DEFAULT_RATE_BP))
    return docs.filter(
        _sample_key(F.col("lang"), F.col("doc_id")) < rate
    ).select("doc_id", "lang", "source")


@register(
    "q_ext_token_budget",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, lang,
         len(string_split(text, ' ')) AS ws_tokens,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / len(string_split(text, ' ')) AS ttr,
         {duck_hex32("CAST(doc_id AS VARCHAR)")} % {N_BUDGET_SHARDS} AS shard
  FROM documents
), ranked AS (
  SELECT doc_id, lang, shard, ws_tokens, ttr,
         sum(ws_tokens) OVER (PARTITION BY lang, shard
                              ORDER BY ttr DESC, doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM toks
)
SELECT doc_id, lang, shard, ws_tokens, round(ttr, 6) AS ttr, cum_tokens
FROM ranked WHERE cum_tokens <= {TOKEN_BUDGET // N_BUDGET_SHARDS}
""",
)
def q_ext_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget packing: per language, keep the highest-quality
    documents (type-token ratio, doc_id tiebreak) until a token budget
    fills.  The stratum is SHARDED on a doc-id hash with the budget
    split across shards, so no single task ever owns a whole language's
    running sum — the difference between a window that works at 100 TB
    and one that serializes terabytes through one partition."""
    prepare(spark)
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "words", F.split("text", " ")
    )
    toks = docs.select(
        "doc_id",
        "lang",
        F.size("words").alias("ws_tokens"),
        (
            F.size(F.array_distinct("words")).cast("double") / F.size("words")
        ).alias("ttr"),
        (hex32(F.col("doc_id").cast("string")) % N_BUDGET_SHARDS).alias("shard"),
    )
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy(F.col("ttr").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        toks.withColumn("cum_tokens", F.sum("ws_tokens").over(w))
        .filter(F.col("cum_tokens") <= TOKEN_BUDGET // N_BUDGET_SHARDS)
        .select(
            "doc_id",
            "lang",
            "shard",
            "ws_tokens",
            F.round("ttr", 6).alias("ttr"),
            "cum_tokens",
        )
    )
