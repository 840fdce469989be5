from __future__ import annotations

import os

import pytest
from pyspark.sql import SparkSession

from polars_ruby_spark.session import configure

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    builder = configure(
        SparkSession.builder.appName("polars-ruby-spark-tests")
        .master("local[*]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
    )
    s = builder.getOrCreate()
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def table_path(name: str) -> str:
    return f"{SF_DIR}/{name}.parquet"


@pytest.fixture(scope="session")
def lineitem(spark):
    import polars_ruby_spark as pl

    return pl.scan_parquet(table_path("lineitem"))


@pytest.fixture(scope="session")
def orders(spark):
    import polars_ruby_spark as pl

    return pl.scan_parquet(table_path("orders"))


@pytest.fixture(scope="session")
def customer(spark):
    import polars_ruby_spark as pl

    return pl.scan_parquet(table_path("customer"))


@pytest.fixture(scope="session")
def events(spark):
    import polars_ruby_spark as pl

    return pl.scan_parquet(table_path("events"))


@pytest.fixture(scope="session")
def documents(spark):
    import polars_ruby_spark as pl

    return pl.scan_parquet(table_path("documents"))


@pytest.fixture(scope="session")
def embeddings(spark):
    import polars_ruby_spark as pl

    return pl.scan_parquet(table_path("embeddings"))
