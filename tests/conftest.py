import pytest


@pytest.fixture(scope="session")
def spark():
    from meresco_rdf_spark.session import get_spark

    session = get_spark(app_name="meresco_rdf_spark-tests", master="local[4]",
                        shuffle_partitions=4)
    yield session
