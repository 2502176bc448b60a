"""Oracle output-type gate.

The driver serializes DuckDB oracle results for the value-hash compare;
DuckDB's HUGEINT/DECIMAL (e.g. from an uncast ``sum()``) serializes
differently from Spark's BIGINT even when values are numerically equal,
which is exactly what turned `sample_mix_stratified` and `pack_sequences`
red in round 4. This gate binds every registered oracle against the
sf0.001 parquet views and asserts no result column has a type outside
the Spark-representable set, so an uncast aggregate can never ship again.

Binding (`con.sql(...)`) resolves output types without executing the
query, so the whole 96-oracle sweep is sub-second.
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("REACH_SPARK_TEST_SF", "/root/testdata/sf0.001")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# DuckDB types whose Python/driver serialization diverges from the Spark
# column they are compared against. HUGEINT comes from uncast sum();
# DECIMAL from avg()/arithmetic on decimals; both must be CAST in the
# oracle (convention: CAST(sum(..) AS BIGINT), documented in textops.py).
BANNED = ("HUGEINT", "UHUGEINT", "DECIMAL")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield c
    c.close()


def test_no_hugeint_or_decimal_in_any_oracle(con):
    oracles = entrymod.oracle_sql()
    assert oracles, "oracle_sql() returned nothing"
    bad: list[str] = []
    for name, sql in oracles.items():
        rel = con.sql(sql)  # bind only — resolves types, no execution
        for col, typ in zip(rel.columns, rel.types):
            t = str(typ).upper()
            if any(b in t for b in BANNED):
                bad.append(f"{name}.{col}: {t}")
    assert not bad, (
        "oracle output columns with driver-unsafe DuckDB types "
        "(wrap in CAST(... AS BIGINT/DOUBLE)): " + "; ".join(bad))


def test_every_query_has_oracle_or_is_declared(con):
    """Every queries() entry should have an oracle; rows-only entries are
    a weaker driver check and must be a deliberate, short list."""
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    missing = [n for n in qs if n not in oracles]
    assert missing == [], f"queries without oracle_sql entries: {missing}"
