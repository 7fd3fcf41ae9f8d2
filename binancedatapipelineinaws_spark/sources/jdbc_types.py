"""MySQL <-> Spark JDBC type-mapping decision matrix.

The reference's only persistent schema is the Aurora MySQL `BTCUSDT`
table (start_all_pipeline.py:463-464 DDL, loaded by
lambda_function.py:26-32); this module pins, column by column, which
Spark type the engine uses for it, why, and what the round-trip
semantics are.  tests/test_sources_jdbc.py::test_jdbc_type_matrix_roundtrip
drives every row through a REAL JDBC write + read-back with boundary
values — against embedded Derby by default, against live MySQL when
`SPARK_GRAFT_JDBC_URL` (+ optional `SPARK_GRAFT_JDBC_DRIVER`) is set,
e.g.::

    SPARK_GRAFT_JDBC_URL='jdbc:mysql://host/db?user=u&password=p' \
    SPARK_GRAFT_JDBC_DRIVER=com.mysql.cj.jdbc.Driver \
    python -m pytest tests/test_sources_jdbc.py -k type_matrix

Decision table (reference MySQL type -> engine Spark type):

| column    | reference DDL | Spark type     | rationale / semantics |
|-----------|---------------|----------------|------------------------|
| bid       | BIGINT        | bigint         | identity: 64-bit signed on both sides, full range round-trips |
| parameter | VARCHAR(10)   | string         | symbol names; written as VARCHAR(10) via createTableColumnTypes (Spark's Derby default for string is CLOB — valid but unindexable) |
| price     | FLOAT(7,2)    | decimal(7,2)   | MySQL FLOAT(M,D) stores a 24-bit float ROUNDED to D decimals on write — values above ~2^24 silently lose integer precision.  DecimalType(7,2) keeps the 2-dp contract exactly at every representable magnitude: a strict-improvement divergence, documented, not an accident |
| quantity  | FLOAT(7,5)    | decimal(7,5)   | same argument at 5 dp (quantities like 0.00001 BTC are exact in decimal, approximated in float32) |
| time      | DATETIME      | timestamp      | reference trade times are epoch-ms; MySQL 5.7 bare DATETIME truncates to whole seconds — against live MySQL declare DATETIME(6) (see MYSQL_DDL_OVERRIDES) or sub-second precision is lost.  Derby TIMESTAMP keeps microseconds |
| maker     | TINYINT(1)    | tinyint        | MySQL's boolean idiom.  Derby has no TINYINT: Spark's Derby dialect writes ByteType as SMALLINT and reads SHORT back — the value domain {0,1} survives, the WIDTH does not; compare after casting back to tinyint |

The matrix below is the machine-readable form: `spark_ddl` builds the
frame, `column_types` feeds createTableColumnTypes where the default
mapping would be wrong (every entry must parse as SPARK DDL — MySQL's
`FLOAT(7,2)` is not expressible there, which is WHY the engine maps it
to DECIMAL), and `readback_cast` restores width-narrowed columns for
comparison.
"""

from __future__ import annotations

JDBC_TYPE_MATRIX: tuple[dict, ...] = (
    {
        "col": "bid",
        "mysql": "BIGINT",
        "spark": "bigint",
        "readback_cast": None,
        "boundaries": "0, +/-1, +/-2^63 range ends",
    },
    {
        "col": "parameter",
        "mysql": "VARCHAR(10)",
        "spark": "string",
        "create_type": "VARCHAR(10)",
        "readback_cast": None,
        "boundaries": "empty string, max-length symbol",
    },
    {
        "col": "price",
        "mysql": "FLOAT(7,2)",
        "spark": "decimal(7,2)",
        "readback_cast": None,
        "boundaries": "0.00, +/-99999.99 (7,2 range ends), 0.01 ulp",
    },
    {
        "col": "quantity",
        "mysql": "FLOAT(7,5)",
        "spark": "decimal(7,5)",
        "readback_cast": None,
        "boundaries": "0.00000, +/-99.99999, 0.00001 ulp",
    },
    {
        "col": "time",
        "mysql": "DATETIME",
        "spark": "timestamp",
        "readback_cast": None,
        "boundaries": "epoch, microsecond fraction, pre-1970",
    },
    {
        "col": "maker",
        "mysql": "TINYINT(1)",
        "spark": "tinyint",
        # Derby SMALLINT comes back as short; restore the declared width
        "readback_cast": "tinyint",
        "boundaries": "0, 1, byte range ends +/-127/-128",
    },
)

# Against live MySQL, pre-create the table with these column types (the
# reference's own DDL plus DATETIME(6) so sub-second precision
# survives); Spark's createTableColumnTypes cannot express FLOAT(M,D).
MYSQL_DDL_OVERRIDES = {
    "price": "FLOAT(7,2)",
    "quantity": "FLOAT(7,5)",
    "time": "DATETIME(6)",
    "maker": "TINYINT(1)",
}


def matrix_schema() -> str:
    return ", ".join(f"{m['col']} {m['spark']}" for m in JDBC_TYPE_MATRIX)


def matrix_create_types() -> str:
    """createTableColumnTypes string for the columns whose default
    JDBC mapping is overridden (currently: VARCHAR instead of CLOB)."""
    parts = [
        f"{m['col']} {m['create_type']}"
        for m in JDBC_TYPE_MATRIX
        if m.get("create_type")
    ]
    return ", ".join(parts)
