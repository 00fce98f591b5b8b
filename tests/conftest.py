import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # small JVM for unit tests

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from mmlspark_spark.core.session import get_spark

    s = get_spark("mmlspark-tests", cpus=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def lineitem(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


@pytest.fixture(scope="session")
def documents(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="session")
def embeddings(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="session")
def basic_df(spark):
    """The reference's makeBasicDF fixture (TestBase.scala:190-204)."""
    return spark.createDataFrame(
        [
            (0, 0.50, "guitars", "drums", 2, True),
            (1, 0.25, "piano", "trumpet", 1, False),
            (2, 0.125, "bass", "cymbals", 0, True),
        ],
        ["numbers", "doubles", "words", "more", "longs", "booleans"],
    )
