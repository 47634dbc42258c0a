"""Guard the oracle registry against DuckDB result types that do not
survive the driver's pandas canonicalization.

Round-4 post-mortem: the driver flagged `hash_match: false` on exactly the
queries whose DuckDB oracle returned HUGEINT — `SUM(BIGINT)` widens to
int128 in DuckDB, pandas renders it as float/object, and the driver's
value hash diverges from Spark's int64 even though the values are equal.
Every oracle must therefore resolve to a type pandas round-trips
faithfully; widening aggregates get an explicit outer `CAST(... AS
BIGINT)`.
"""

import duckdb
import pytest

from tests.conftest import SF_DIR

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# Single source of truth lives next to the comparator so the pytest guard
# and the matrix checker can never drift apart.
from tools.check_oracle import PANDAS_FAITHFUL


@pytest.fixture(scope="module")
def oracle_types():
    import __spark_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    out = {}
    for name, sql in entry.oracle_sql().items():
        rel = con.sql(sql)
        out[name] = list(zip(rel.columns, [str(t) for t in rel.types]))
    con.close()
    return out


def test_no_hugeint_or_exotic_types(oracle_types):
    offenders = [
        (name, col, tpe)
        for name, cols in oracle_types.items()
        for col, tpe in cols
        if tpe not in PANDAS_FAITHFUL
    ]
    assert offenders == [], (
        "oracle columns with driver-unsafe DuckDB types (wrap the "
        "aggregate in an outer CAST): %r" % offenders
    )


def test_sum_aggregates_cast_back_to_bigint(oracle_types):
    # The specific round-4 failure shape: any SUM over integers must not
    # surface as HUGEINT.
    for name, cols in oracle_types.items():
        for col, tpe in cols:
            assert "HUGEINT" not in tpe, (name, col, tpe)
