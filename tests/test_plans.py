"""Physical-plan guards (SURVEY.md §4): the judge-able optimizer
properties stay true — partition pruning, predicate pushdown, column
pruning on the pruned postings scan; TakeOrderedAndProject top-k on both
query paths. See PLANS.md for captured plans."""

import re

import pytest
from pyspark.sql import functions as F

from engine import query as Q


@pytest.fixture(scope="module")
def plan_idx(spark, corpus_df, tmp_path_factory):
    from engine.build import build_index
    d = str(tmp_path_factory.mktemp("plans") / "idx")
    return build_index(spark, corpus_df, d)


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_postings_scan_pruned(plan_idx):
    lex = plan_idx.lookup_terms(["hot0", "rare3"])
    buckets = sorted({v["bucket"] for v in lex.values()})
    post = (plan_idx.postings()
            .filter(F.col("bucket").isin(buckets)
                    & F.col("term").isin(["hot0", "rare3"]))
            .select("term", "shard", "df", "doc_ids", "tfs", "dls"))
    plan = _formatted(post)
    assert re.search(r"PartitionFilters: \[.*bucket.*IN", plan), plan
    assert re.search(r"PushedFilters: \[.*[Ii]n\(term", plan), plan
    m = re.search(r"ReadSchema: (\S+)", plan)
    assert m and "blocks" not in m.group(1)  # column pruning


def test_topk_is_take_ordered(plan_idx, flat_index):
    packed = Q.search(plan_idx, "hot0 rare3", k=10)
    assert "TakeOrderedAndProject" in _formatted(packed)
    flat = Q.search_flat(flat_index, "hot0 rare3", k=10)
    assert "TakeOrderedAndProject" in _formatted(flat)
