import pytest


@pytest.fixture(scope="session")
def spark():
    from pbf2json_spark.plans.session import build_session
    s = build_session(app_name="pbf2json-spark-tests", cores=8,
                      shuffle_partitions=8)
    yield s
    s.stop()
