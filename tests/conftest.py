import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cloud_based_web_crawling_indexing_system_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    # CBWCIS_TEST_MASTER / CBWCIS_TEST_SHUFFLE let the flake-stress
    # harness (scripts/stress_zero_delay.sh, VERDICT r5 #3) sweep
    # parallelism without editing this file; defaults unchanged
    s = get_spark(
        master=os.environ.get("CBWCIS_TEST_MASTER", "local[4]"),
        app_name="cbwcis-tests",
        shuffle_partitions=int(os.environ.get("CBWCIS_TEST_SHUFFLE", "8")),
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_corpus(tmp_path_factory):
    from cloud_based_web_crawling_indexing_system_spark.sources.fixtures import write_corpus

    d = tmp_path_factory.mktemp("corpus_tiny")
    paths = write_corpus(str(d), scale="tiny", seed=42)
    return paths
