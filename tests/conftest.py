from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_workers_spark import WorkersConfig, build_session  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    import tempfile

    spark = build_session(
        WorkersConfig(
            app_name="kafka_workers_spark_tests",
            shuffle_partitions=8,
            extra_confs={
                "spark.driver.memory": "8g",
                "spark.sql.streaming.checkpointLocation.deleteOnStop": "true",
                "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="kw_warehouse_"),
                # Janino whole-stage compilation is pure overhead on this
                # suite's tiny frames (~5% of module wall measured on
                # test_similarity); values are codegen-independent, so the
                # DuckDB fidelity gate is unaffected, and no plan test
                # asserts codegen spans (plans/audit.py counts them but
                # nothing asserts the count). The driver's own sessions
                # (CORRECTNESS + bench) keep the production default.
                "spark.sql.codegen.wholeStage": "false",
            },
        )
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    """Oracle-gate scale factor.

    Defaults to the driver's correctness SF (sf0.01) so the local gate is an
    exact replica of the per-round CORRECTNESS check. Override with
    SPARK_GRAFT_TEST_SF=/root/testdata/sf0.001 for fast iteration.
    """
    return os.environ.get("SPARK_GRAFT_TEST_SF", SF_CORRECTNESS)


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    yield con
    con.close()


@pytest.fixture(scope="module")
def no_aqe(spark):
    """Module-scoped AQE-off: for modules whose tests run many actions
    over tiny data through deep multi-exchange plans, where AQE's
    per-stage materialization round-trips dominate wall time and every
    asserted value is AQE-independent. Windowed-query fidelity tests
    (test_relational.py) keep the session default (AQE on, the
    driver's config). Activate per module with:

        _no_aqe = pytest.fixture(scope="module", autouse=True)(
            lambda no_aqe: None)
    """
    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield
    spark.conf.set("spark.sql.adaptive.enabled", old)
