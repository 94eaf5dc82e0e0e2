import os
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    from autosinapi_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    wh = str(tmp_path_factory.mktemp("spark-warehouse"))
    s = get_spark(
        app_name="autosinapi-tests",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": wh},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck(tmp_path_factory):
    import duckdb

    # Explicit budget + spill path: the fixture shares its process
    # with a 16 GB-heap Spark driver for ~190 oracle executions, and
    # without a limit DuckDB sizes its pool off total RAM and can hit
    # OutOfMemoryException late in a single-process full-suite run
    # (the embedding_pca_top2 oracle's 128 unrolled power rounds was
    # the observed peak). With a hard limit it spills to disk instead.
    con = duckdb.connect(
        config={
            "memory_limit": "6GB",
            "temp_directory": str(tmp_path_factory.mktemp("duckdb-spill")),
        }
    )
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{SF_SMOKE}/{name}.parquet')"
        )
    yield con
    con.close()


@pytest.fixture
def no_rebalance(monkeypatch):
    """Disable the fixture-layout scan rebalance for plan-shape pins.

    Plan-pin tests assert the ALGORITHM's exchange structure; the scan
    rebalance (catalog._rebalance_scan — a local workaround for
    single-row-group fixture files, a no-op at deployment scale) sits
    below that structure and is pinned separately in
    tests/test_scan_rebalance.py.
    """
    monkeypatch.setenv("SPARK_GRAFT_SCAN_REBALANCE", "0")
