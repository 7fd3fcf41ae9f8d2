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
