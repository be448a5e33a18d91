import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from x227f_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "8")),
                  app_name="x227f_tests")
    yield s


@pytest.fixture(scope="session")
def corpus():
    from x227f_spark.sources.corpus import generate

    return generate()


@pytest.fixture(scope="session")
def corpus_dir(corpus, tmp_path_factory):
    from x227f_spark.sources.corpus import write_parquet

    d = tmp_path_factory.mktemp("corpus")
    write_parquet(corpus, str(d))
    return str(d)
