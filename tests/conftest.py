import pytest


@pytest.fixture(scope="session")
def spark():
    from xltsearch_spark.session import get_spark
    s = get_spark("tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_corpus():
    from xltsearch_spark.sources.corpus import generate_corpus
    return generate_corpus(64)


@pytest.fixture(scope="session")
def small_corpus():
    from xltsearch_spark.sources.corpus import generate_corpus
    return generate_corpus(200)
