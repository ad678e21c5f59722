import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from engine.session import get_spark
    s = get_spark("engine-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_pdf():
    from engine.fixtures import make_transcripts
    return make_transcripts(200)  # unit/smoke size (~1.3k turns)


@pytest.fixture(scope="session")
def corpus_df(spark, corpus_pdf):
    from engine.fixtures import spark_transcripts
    return spark_transcripts(spark, n_convs=200, n_parts=6).cache()


@pytest.fixture(scope="session")
def oracle_idx(corpus_pdf):
    from engine.oracle import OracleIndex
    return OracleIndex(list(zip(range(len(corpus_pdf)), corpus_pdf.text)))


@pytest.fixture(scope="session")
def flat_index(spark, corpus_df):
    from engine.build import build_flat_index
    return build_flat_index(spark, corpus_df)
