import pytest


@pytest.fixture(scope="session")
def spark():
    from honas_spark.session import get_spark

    s = get_spark(app="honas_spark_tests", cpus=4, shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
