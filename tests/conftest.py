from __future__ import annotations

import pytest


SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from ocr_search_spark.session import get_spark

    s = get_spark("ocr-search-spark-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def base_texts():
    from ocr_search_spark.corpus import load_base_texts

    return load_base_texts(SF_DIR)
