"""Driver-mirror correctness gate: every registry query must match its
DuckDB oracle at sf0.01 (row count + order-insensitive values)."""

import pytest

from tests.conftest import SF_ORACLE, normalize_rows


def _registry():
    from geoparquet_io_spark.queries import REGISTRY

    return REGISTRY


def pytest_generate_tests(metafunc):
    if "qname" in metafunc.fixturenames:
        names = sorted(_registry().keys())
        # GPIO_ORACLE_SHARD="k/n" runs only every n-th query starting at
        # k — lets scripts/test_fast.sh fan the oracle suite (the wall-
        # clock dominator) across concurrent pytest processes, each with
        # its own Spark session.  Unset -> full suite (driver behavior
        # unchanged).
        import os

        shard = os.environ.get("GPIO_ORACLE_SHARD")
        if shard:
            k, n = (int(x) for x in shard.split("/"))
            names = [q for i, q in enumerate(names) if i % n == k]
        metafunc.parametrize("qname", names)


def test_query_matches_oracle(spark, duck, qname):
    fn, oracle = _registry()[qname]
    sdf = fn(spark, SF_ORACLE)
    spark_rows = [tuple(r) for r in sdf.collect()]
    assert len(spark_rows) > 0, f"{qname}: empty result"
    if oracle is None:
        pytest.skip(f"{qname}: rows-only check (no SQL oracle)")
    oracle_rows = duck.execute(oracle).fetchall()
    assert len(spark_rows) == len(oracle_rows), (
        f"{qname}: row count {len(spark_rows)} != oracle {len(oracle_rows)}"
    )
    s, o = normalize_rows(spark_rows), normalize_rows(oracle_rows)
    mismatches = [(a, b) for a, b in zip(s, o) if a != b]
    assert not mismatches, f"{qname}: first mismatches {mismatches[:3]}"
