"""Cache lifecycle of the dedup query module (VERDICT r5 #5): the
persist()ed multi-consumer subtrees are tracked, and release_caches()
empties the session's SQL cache manager — so a library caller composing
these queries outside the registry sweep (whose wrapper clears the
cache on entry) can bound the session cache explicitly."""

from __future__ import annotations

import pytest

from aind_protein_data_transformation_spark.queries import llm_dedup


def _cache_manager_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


@pytest.mark.parametrize(
    "qname",
    ["dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_cluster_components"],
)
def test_release_caches_empties_cache_manager(spark, sf_dir, qname):
    spark.catalog.clearCache()
    llm_dedup._PERSISTED.clear()
    fn = getattr(llm_dedup, qname)
    n = fn(spark, sf_dir).count()
    assert n > 0
    # the query legitimately cached its multi-consumer subtree(s)...
    assert llm_dedup._PERSISTED
    assert not _cache_manager_empty(spark)
    # ...and the hook releases every one of them
    llm_dedup.release_caches()
    assert not llm_dedup._PERSISTED
    assert _cache_manager_empty(spark)


def test_release_is_idempotent_and_rerun_reprimes(spark, sf_dir):
    llm_dedup.release_caches()
    llm_dedup.release_caches()  # no-op on empty
    llm_dedup.dedup_ngram_jaccard(spark, sf_dir).count()
    assert llm_dedup._PERSISTED
    llm_dedup.release_caches()
    assert _cache_manager_empty(spark)
