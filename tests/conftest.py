import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from explora_kafka_spark.session import get_spark

    s = get_spark(app_name="explora-tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def events(spark, sf_dir):
    from explora_kafka_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "events").cache()


@pytest.fixture(scope="session")
def readings(events):
    from explora_kafka_spark.sources.tables import readings_from_events

    return readings_from_events(events).cache()
