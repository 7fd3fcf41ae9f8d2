"""Scale-pattern proofs: partition pruning actually prunes, bucketed
joins actually avoid the shuffle, salting preserves semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from binancedatapipelineinaws_spark.operators.scaling import (
    write_bucketed_tables,
    write_partitioned_events,
)

SF = "/root/testdata/sf0.001"


def test_partition_pruning(spark, tmp_path):
    out = str(tmp_path / "events_by_day")
    write_partitioned_events(spark, SF, out)
    df = spark.read.parquet(out).filter(F.col("event_date") == "2024-01-02")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_date" in plan
    # pruned scan reads only the one matching partition directory
    # (input_file_name reflects files actually read post-pruning;
    # DataFrame.inputFiles() lists the whole relation)
    files = [r[0] for r in df.select(F.input_file_name()).distinct().collect()]
    assert files, "no files matched"
    assert all("event_date=2024-01-02" in f for f in files)


def test_bucketed_join_no_exchange(spark, tmp_path):
    # warehouse dir is static config, set in session.get_spark (tmp dir)
    li_name, o_name = write_bucketed_tables(spark, SF, db_suffix="_t")
    li = spark.table(li_name)
    o = spark.table(o_name)
    # at this SF Catalyst would broadcast (also exchange-free but not the
    # pattern under test); force the sort-merge path the layout targets
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(o, li.l_orderkey == o.o_orderkey).select(
            "l_orderkey", "l_quantity", "o_totalprice"
        )
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert (
            "Exchange hashpartitioning" not in plan
        ), "bucketed join still shuffled"
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
    # result parity with the plain join
    from binancedatapipelineinaws_spark.tables import load_table

    plain = (
        load_table(spark, SF, "lineitem")
        .join(
            load_table(spark, SF, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("l_orderkey", "l_quantity", "o_totalprice")
    )
    assert joined.count() == plain.count()
    assert joined.exceptAll(plain).count() == 0


def test_salted_agg_matches_plain(spark):
    from binancedatapipelineinaws_spark.registry import queries

    salted = queries()["q_skew_salted_agg"](spark, SF)
    from binancedatapipelineinaws_spark.tables import load_table

    plain = (
        load_table(spark, SF, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
    )
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_dupspan_gram_rows_linear_in_hot_gram(spark):
    """A gram shared by k docs must cost O(k) rows through the dupspan
    plan, never O(k^2): plant one ubiquitous gram across every doc and
    assert the windowed row count stays corpus-gram-sized."""
    import pyspark.sql.functions as F

    from binancedatapipelineinaws_spark.functions.corpus import DUPSPAN_N

    boiler = " ".join(f"w{i}" for i in range(DUPSPAN_N))
    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit(boiler + " "), F.col("id").cast("string"),
            F.lit(" x y z u v"),
        ).alias("text"),
    )
    words = docs.select("doc_id", F.split("text", " ").alias("words"))
    pos = words.select(
        "doc_id", "words",
        F.explode(
            F.when(
                F.size("words") >= DUPSPAN_N,
                F.sequence(F.lit(0), F.size("words") - DUPSPAN_N),
            ).otherwise(F.array().cast("array<int>"))
        ).alias("j"),
    )
    grams = pos.select(
        "doc_id",
        F.array_join(F.slice("words", F.col("j") + 1, DUPSPAN_N), "_").alias(
            "gram"
        ),
    )
    # the window input IS the gram stream: 200 docs x (len-4) grams,
    # no pair blowup from the gram all 200 docs share
    n_grams = grams.count()
    assert n_grams < 200 * 20  # linear bound; k^2 would be >= 40000
    from pyspark.sql import Window

    gw = Window.partitionBy("gram")
    flagged = grams.select(
        "doc_id",
        (F.min("doc_id").over(gw) != F.max("doc_id").over(gw)).alias("d"),
    )
    assert flagged.count() == n_grams  # row-preserving, not pair-making


def test_bigram_lm_table_is_vocab_bounded(spark):
    """The broadcast LM table must be bounded by vocabulary^2, not by
    corpus row count: doubling the corpus by unioning it with itself
    must not grow the LM."""
    from binancedatapipelineinaws_spark.functions.retrieval import (
        q_ext_bigram_lm_score,
    )
    from binancedatapipelineinaws_spark.tables import load_table
    import pyspark.sql.functions as F

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")

    def lm_size(frame):
        w = frame.select("doc_id", F.split("text", " ").alias("words"))
        pos = w.select(
            "doc_id", "words",
            F.explode(
                F.when(
                    F.size("words") >= 2,
                    F.sequence(F.lit(0), F.size("words") - 2),
                ).otherwise(F.array().cast("array<int>"))
            ).alias("j"),
        )
        bg = pos.select(
            F.element_at("words", F.col("j") + 1).alias("w1"),
            F.element_at("words", F.col("j") + 2).alias("w2"),
        )
        return bg.groupBy("w1", "w2").count().count()

    single = lm_size(docs)
    doubled = lm_size(
        docs.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + 100000)
        )
    )
    assert doubled == single
