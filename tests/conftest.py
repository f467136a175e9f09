import pytest


@pytest.fixture(scope="session")
def spark():
    from webtext_extraction_spark.session import get_spark

    spark = get_spark(app_name="webtext-tests", cores=4, shuffle_partitions=8)
    yield spark
    spark.stop()
