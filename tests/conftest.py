import os
import shutil

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # keep test sessions light


@pytest.fixture(scope="session")
def spark():
    from customer_er_spark.session import get_spark

    s = get_spark("customer_er_spark_tests", master="local[8]",
                  shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def small_corpus(tmp_path_factory):
    """Deterministic synthetic image corpus shared across tests."""
    from customer_er_spark.datagen import write_corpus

    out = str(tmp_path_factory.mktemp("corpus"))
    info = write_corpus(out, n_base=300, dup_fraction=0.3, seed=42)
    return info


@pytest.fixture()
def catalog(spark, tmp_path):
    from customer_er_spark.catalog import SparkCatalog

    cdir = str(tmp_path / "catalog")
    yield SparkCatalog(spark, cdir)
    shutil.rmtree(cdir, ignore_errors=True)
