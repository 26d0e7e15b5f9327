import pytest

from geotables_jl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("geotables-tests", cpus=8, shuffle_partitions=8)
    yield s
