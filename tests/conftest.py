import pytest

from cosmospark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="cosmospark-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
