from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")


@pytest.fixture(scope="session")
def spark():
    from otar3088_spark.session import get_spark

    s = get_spark(app_name="otar3088-tests", cores=int(os.environ["SPARK_GRAFT_CPUS"]))
    yield s


@pytest.fixture(scope="session")
def transcripts_pd():
    from otar3088_spark.synth import transcripts_pandas

    return transcripts_pandas(n_convs=40)


@pytest.fixture(scope="session")
def dictionary_pd():
    from otar3088_spark.synth import entity_dictionary_pandas

    return entity_dictionary_pandas()


@pytest.fixture(scope="session")
def events_pd():
    from otar3088_spark.synth import events_pandas

    return events_pandas(n=200)


@pytest.fixture(scope="session")
def transcripts_df(spark, transcripts_pd):
    return spark.createDataFrame(transcripts_pd).cache()


@pytest.fixture(scope="session")
def dictionary_df(spark, dictionary_pd):
    return spark.createDataFrame(dictionary_pd)


@pytest.fixture(scope="session")
def events_df(spark, events_pd):
    return spark.createDataFrame(events_pd)


SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
