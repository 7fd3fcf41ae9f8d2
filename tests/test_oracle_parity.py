"""Replicates the driver's correctness gate: every registered query with
an oracle must match DuckDB on row count, column names, and
order-insensitive values at sf0.01 (same compare as
tools/check_oracle.py)."""

from __future__ import annotations

import pytest

from binancedatapipelineinaws_spark.registry import all_specs
from tools.check_oracle import normalize

SPECS = all_specs()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(name, spark, duck):
    spec = SPECS[name]
    sdf = spec.fn(spark, "/root/testdata/sf0.01")
    srows = [tuple(r) for r in sdf.collect()]
    if spec.oracle is None:
        assert len(srows) >= 0  # rows-only check: must run
        return
    res = duck.execute(spec.oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert len(srows) == len(orows), f"rowcount {len(srows)} != {len(orows)}"
    assert sorted(sdf.columns) == sorted(ocols)
    ns = normalize(srows, sdf.columns)
    no = normalize(orows, ocols)
    ndiff = sum(1 for a, b in zip(ns, no) if a != b)
    sample = [(a, b) for a, b in zip(ns, no) if a != b][:3]
    assert ns == no, f"{ndiff}/{len(ns)} rows differ; sample {sample}"
