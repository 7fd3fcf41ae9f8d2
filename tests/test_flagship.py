from __future__ import annotations

import importlib.util


def _load_entry_module():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_smoke(spark):
    mod = _load_entry_module()
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["n_name", "revenue"]


def test_flagship_matches_oracle_sf001(spark, duck):
    from binancedatapipelineinaws_spark.plans.flagship import (
        FLAGSHIP_ORACLE,
        local_supplier_revenue,
    )

    sdf = local_supplier_revenue(spark, "/root/testdata/sf0.01")
    srows = [(r.n_name, round(r.revenue, 2)) for r in sdf.collect()]
    orows = [(n, round(v, 2)) for n, v in duck.execute(FLAGSHIP_ORACLE).fetchall()]
    assert srows == orows


def test_flagship_plan_has_broadcast_joins(spark):
    from binancedatapipelineinaws_spark.plans.flagship import local_supplier_revenue

    plan = local_supplier_revenue(
        spark, "/root/testdata/sf0.001"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
