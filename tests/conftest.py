import pytest


@pytest.fixture(scope="session")
def spark():
    from texteller_spark.session import build_session

    s = build_session("texteller-tests", cpus=4, shuffle_partitions=8)
    yield s
    s.stop()
