import pytest


@pytest.fixture(scope="session")
def spark():
    from code_index_spark.session import get_spark

    s = get_spark("code-index-spark-tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def synth_corpus():
    from code_index_spark.synth import synthesize

    return synthesize(60, seed=42, long_conv_turns=150)
