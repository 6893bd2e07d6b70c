import pytest


@pytest.fixture(scope="session")
def spark():
    from robosat_spark.session import get_spark

    s = get_spark(app="robosat_spark_tests", cores=4, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
