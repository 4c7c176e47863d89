import pytest


@pytest.fixture(scope="session")
def spark():
    from great_expectations_spark.sources.session import get_spark

    s = get_spark(cores=4, app="gxs-tests", shuffle_partitions=4)
    yield s
