"""Retrieval-scoring operators over `documents`: BM25 against a seed
query and a corpus bigram language-model score per document — the two
classic "score every document against a small model of what I want"
shapes a training-data pipeline uses for quality filtering and
importance resampling (DSIR-style seed-set scoring).

Scale notes (100 TB):
- BM25 filters the exploded term stream to the query vocabulary BEFORE
  any aggregation, so the corpus-sized stage is a filter that Catalyst
  pushes against the Generate; everything downstream (per-doc tf for
  |Q| terms, df, avgdl) is query-bounded or scalar and broadcasts.
- The bigram LM is built with partial-aggregated groupBys (map-side
  combine absorbs Zipf-head words; a count-window PARTITION BY w1
  would instead buffer every "the ..." bigram on one task).  The
  unigram denominator derives from the already-vocabulary-bounded
  bigram table — no second corpus pass — and the finished LM joins
  back to the stream as a broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from binancedatapipelineinaws_spark.registry import register
from binancedatapipelineinaws_spark.session import prepare
from binancedatapipelineinaws_spark.tables import load_table

BM25_QUERY = ("spark", "query", "join")  # seed terms scored against docs
BM25_K1 = 1.2
BM25_B = 0.75


def _duck_query_list() -> str:
    return ", ".join(f"'{t}'" for t in BM25_QUERY)


@register(
    "q_ext_bm25",
    oracle=f"""
WITH stats AS (
  SELECT count(*) AS n_docs,
         avg(len(string_split(text, ' '))) AS avgdl
  FROM documents
), dl AS (
  SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents)
  WHERE term IN ({_duck_query_list()})
  GROUP BY doc_id, term
), df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
)
SELECT tf.doc_id, count(*) AS n_matched,
       round(sum(
         ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1)
         * tf.tf * ({BM25_K1} + 1)
         / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / s.avgdl))
       ), 6) AS bm25
FROM tf
JOIN df USING (term)
JOIN dl USING (doc_id)
CROSS JOIN stats s
GROUP BY tf.doc_id
""",
)
def q_ext_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 score of every document against the seed query
    {BM25_QUERY} (k1={BM25_K1}, b={BM25_B}).

    The term filter lands between the explode and the aggregate, so
    only query-vocabulary terms ever reach a shuffle; df and the
    (n_docs, avgdl) scalars are broadcast.  Two corpus passes (doc
    lengths + term stream) read the same cached scan at test scale and
    column-pruned parquet at cluster scale — both passes are map-only
    until the query-bounded aggregate."""
    prepare(spark)
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select("doc_id", F.split("text", " ").alias("words"))
    stats = w.agg(
        F.count("*").alias("n_docs"), F.avg(F.size("words")).alias("avgdl")
    )
    dl = w.select("doc_id", F.size("words").alias("dl"))
    tf = (
        w.select("doc_id", F.explode("words").alias("term"))
        .filter(F.col("term").isin(*BM25_QUERY))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
    )
    denom = F.col("tf") + BM25_K1 * (
        1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl")
    )
    return (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_matched"),
            F.round(
                F.sum(idf * F.col("tf") * (BM25_K1 + 1) / denom), 6
            ).alias("bm25"),
        )
    )


@register(
    "q_ext_bigram_lm_score",
    oracle="""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
pos AS (
  SELECT doc_id, words, unnest(range(greatest(len(words) - 1, 0))) AS j
  FROM w
), bg AS (
  SELECT doc_id, words[j + 1] AS w1, words[j + 2] AS w2 FROM pos
), counted AS (
  SELECT doc_id,
         ln(CAST(count(*) OVER (PARTITION BY w1, w2) AS DOUBLE)
            / count(*) OVER (PARTITION BY w1)) AS logp
  FROM bg
)
SELECT doc_id, count(*) AS n_bigrams,
       round(avg(logp), 6) AS avg_logp
FROM counted GROUP BY doc_id
""",
)
def q_ext_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average bigram log-likelihood of each document under the
    corpus's own bigram model: ln(c(w1,w2) / c(w1)) averaged over the
    doc's bigrams — the self-perplexity signal that flags template
    spam (too likely) and garbage (too unlikely) in one number.

    Plan: bigram stream -> partial-aggregated c(w1,w2) table
    (vocabulary-bounded; map-side combine absorbs Zipf-head skew that
    a count-window over PARTITION BY w1 would concentrate on one
    task) -> c(w1) derived by re-aggregating that SMALL table (no
    second corpus pass) -> broadcast LM joined back to the stream ->
    per-doc average.  The model is exactly the full-corpus MLE the
    oracle computes; the corpus is scanned twice map-only (LM build,
    scoring), never cached."""
    prepare(spark)
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select("doc_id", F.split("text", " ").alias("words"))
    pos = w.select(
        "doc_id",
        "words",
        F.explode(
            F.when(
                F.size("words") >= 2,
                F.sequence(F.lit(0), F.size("words") - 2),
            ).otherwise(F.array().cast("array<int>"))
        ).alias("j"),
    )
    bg = pos.select(
        "doc_id",
        F.element_at("words", F.col("j") + 1).alias("w1"),
        F.element_at("words", F.col("j") + 2).alias("w2"),
    )
    lm12 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    lm1 = lm12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    lm = lm12.join(lm1, "w1").select(
        "w1",
        "w2",
        F.log(F.col("c12").cast("double") / F.col("c1")).alias("logp"),
    )
    return (
        bg.join(F.broadcast(lm), ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg("logp"), 6).alias("avg_logp"),
        )
    )
