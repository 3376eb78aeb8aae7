import pytest


@pytest.fixture(scope="session")
def spark():
    from searchengine_spark.session import get_spark

    s = get_spark(app_name="pytest", cores=4, shuffle_partitions=4)
    yield s
