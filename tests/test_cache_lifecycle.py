"""Signature-table cache lifecycle (VERDICT r2 #7): the minhash pipeline
caches its signature table for the three consumers inside one action, but
nothing may stay pinned after the caller releases — and the parquet
write-through path must never touch the cache at all.
"""

from __future__ import annotations

from apachebeam_python_spark.operators import dedup as D
from apachebeam_python_spark.session import table


def test_release_drops_every_pinned_signature_table(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(200)
    pairs = D.minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.2)
    pairs.count()  # materialize — the cache is live during this action
    assert len(D._SIG_CACHES) == 1
    cached = D._SIG_CACHES[0]
    assert cached.storageLevel.useMemory, "signature table should be cached"
    released = D.release_signature_caches()
    assert released == 1
    assert not D._SIG_CACHES, "registry must be empty after release"
    assert not cached.storageLevel.useMemory, "cache entry survived release"


def test_release_is_idempotent_and_counts(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(100)
    D.minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.2).count()
    D.minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.3).count()
    assert D.release_signature_caches() == 2
    assert D.release_signature_caches() == 0


def test_checkpoint_dir_write_through_skips_cache(spark, sf_dir, tmp_path):
    docs = table(spark, sf_dir, "documents").limit(200)
    before = len(D._SIG_CACHES)
    pairs = D.minhash_lsh_pairs(
        docs, "text", "doc_id", threshold=0.2, checkpoint_dir=str(tmp_path)
    )
    n = pairs.count()
    assert len(D._SIG_CACHES) == before, "checkpoint path must not cache"
    assert (tmp_path / "minhash_grams").exists(), "gram table not written"
    # write-through result must equal the cached-path result
    cached = D.minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.2)
    assert n == cached.count()
    assert {tuple(r) for r in pairs.collect()} == {tuple(r) for r in cached.collect()}
    D.release_signature_caches()
