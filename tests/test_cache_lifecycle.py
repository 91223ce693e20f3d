"""Cache lifecycle of the query modules (VERDICT r5 #5, generalized
round 6): every module-level persist() goes through the shared
tracked-persist helper (queries/cache.py), and release_caches() empties
the session's SQL cache manager — so a library caller composing these
queries outside the registry sweep (whose wrapper clears the cache on
entry) can bound the session cache explicitly."""

from __future__ import annotations

import pytest

from aind_protein_data_transformation_spark.queries import cache as qcache
from aind_protein_data_transformation_spark.queries import (
    curation,
    llm_dedup,
    llm_similarity,
    llm_text,
)


def _cache_manager_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


@pytest.mark.parametrize(
    "fn",
    [
        llm_dedup.dedup_minhash_lsh,
        llm_dedup.dedup_ngram_jaccard,
        llm_dedup.dedup_cluster_components,
        llm_similarity.dedup_embedding_cosine,
        llm_text.text_tfidf_keywords,
        curation.decontaminate_ngram_overlap,
    ],
    ids=lambda f: f.__name__,
)
def test_release_caches_empties_cache_manager(spark, sf_dir, fn):
    spark.catalog.clearCache()
    qcache._PERSISTED.clear()
    n = fn(spark, sf_dir).count()
    assert n > 0
    # the query legitimately cached its multi-consumer subtree(s)...
    assert qcache._PERSISTED
    assert not _cache_manager_empty(spark)
    # ...and the shared hook releases every one of them
    qcache.release_caches()
    assert not qcache._PERSISTED
    assert _cache_manager_empty(spark)


def test_release_is_idempotent_and_rerun_reprimes(spark, sf_dir):
    qcache.release_caches()
    qcache.release_caches()  # no-op on empty
    llm_dedup.dedup_ngram_jaccard(spark, sf_dir).count()
    assert qcache._PERSISTED
    qcache.release_caches()
    assert _cache_manager_empty(spark)


def test_no_untracked_persist_calls_in_query_modules():
    """Grep-level invariant: no query module may call .persist()
    directly — everything goes through the tracked helper so
    release_caches() can always drain the session."""
    import glob
    import os

    qdir = os.path.dirname(llm_dedup.__file__)
    offenders = []
    for path in glob.glob(os.path.join(qdir, "*.py")):
        if os.path.basename(path) == "cache.py":
            continue
        with open(path) as fh:
            for i, line in enumerate(fh, 1):
                if ".persist()" in line and not line.lstrip().startswith("#"):
                    offenders.append(f"{os.path.basename(path)}:{i}")
    assert not offenders, f"untracked persist() in query modules: {offenders}"
