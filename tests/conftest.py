from __future__ import annotations

import shutil

import pytest

from mtix_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="mtix_spark_tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def small_docs(spark):
    """1000-doc deterministic corpus with assigned docIDs, cached."""
    from mtix_spark.corpus import synth_corpus
    from mtix_spark.index.build import assign_doc_ids

    docs = assign_doc_ids(synth_corpus(spark, 1000), 8).cache()
    docs.count()
    return docs


@pytest.fixture(scope="session")
def small_index(spark, small_docs, tmp_path_factory):
    from mtix_spark.index.build import build_index

    out = str(tmp_path_factory.mktemp("idx") / "index")
    shutil.rmtree(out, ignore_errors=True)
    return build_index(spark, small_docs, out, n_segments=6)
