import pytest

from hipporag_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(parallelism=8, app_name="hipporag_spark_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def tiny_files(spark):
    """9-file fixture mirroring the reference's 9-doc toy corpus
    (/root/reference/tests_local.py:13-22)."""
    from hipporag_spark.synth import repo_files

    return repo_files(spark, 9).persist()


@pytest.fixture(scope="session")
def small_files(spark):
    from hipporag_spark.synth import repo_files

    return repo_files(spark, 300).persist()
