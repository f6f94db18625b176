"""Round-7 index-lifecycle hardening: single-writer lease, replay-safe
probes (index anti-joined against the incoming id set), within-batch
pair detection in the stream loop, id_col meta validation, and the
object-store-safe versioned publish (CURRENT pointer file)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from trisk_datawrangle_spark.llm.dedup import minhash_lsh_incremental_pairs
from trisk_datawrangle_spark.llm.lsh_index import (
    acquire_index_lease,
    gc_index_versions,
    lsh_index_append,
    minhash_lsh_index_pairs,
    publish_index_versioned,
    read_index_meta,
    release_index_lease,
    resolve_index_path,
    stream_dedup_ingest,
    write_lsh_index,
)


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )


def _split(docs):
    existing = docs.filter(F.col("doc_id") % 10 != 0)
    incoming = docs.filter(F.col("doc_id") % 10 == 0)
    return existing, incoming


# ---------------------------------------------------------------- replay


def test_probe_is_replay_safe_after_append(spark, tmp_path_factory):
    """The crash-replay scenario the probe must survive: the append
    landed but the stream never committed, so the batch is re-probed
    against an index that ALREADY CONTAINS the batch's own docs. The
    anti-join must make that probe reproduce the original pairs
    exactly (id-disjoint contract intact)."""
    path = str(tmp_path_factory.mktemp("lsh_replay")) + "/idx"
    docs = _docs(spark)
    existing, incoming = _split(docs)
    write_lsh_index(existing, path, num_hashes=64, bands=32, n_shards=8)

    before = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_lsh_index_pairs(
            spark, path, incoming, threshold=0.5
        ).collect()
    }
    assert before, "fixture must produce cross-set pairs"
    lsh_index_append(incoming, path)  # the batch is now IN the index
    after = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_lsh_index_pairs(
            spark, path, incoming, threshold=0.5
        ).collect()
    }
    assert before == after
    inc_ids = {r.doc_id for r in incoming.select("doc_id").collect()}
    # id-disjoint output contract: no incoming id on the index side
    assert not {a for a, _ in after} & inc_ids


def test_probe_leaves_no_cached_storage(spark, tmp_path_factory):
    """The per-call caches must be unpersisted before the probe
    returns (a long-running ingest loop would otherwise grow executor
    storage every micro-batch)."""
    path = str(tmp_path_factory.mktemp("lsh_nocache")) + "/idx"
    docs = _docs(spark)
    existing, incoming = _split(docs)
    write_lsh_index(existing, path, num_hashes=64, bands=32, n_shards=8)

    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    pairs = minhash_lsh_index_pairs(spark, path, incoming, threshold=0.5)
    assert pairs.count() > 0
    # the returned frame is a localCheckpoint (its RDD is persistent by
    # design); the three internal caches must be gone
    assert jsc.getPersistentRDDs().size() <= before + 1


def test_append_and_probe_reject_wrong_id_col(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("lsh_idcol")) + "/idx"
    docs = _docs(spark)
    existing, incoming = _split(docs)
    write_lsh_index(existing, path, num_hashes=64, bands=32, n_shards=8)
    renamed = incoming.withColumnRenamed("doc_id", "other_id")
    with pytest.raises(ValueError, match="id_col"):
        lsh_index_append(renamed, path, id_col="other_id")
    with pytest.raises(ValueError, match="id_col"):
        minhash_lsh_index_pairs(spark, path, renamed, id_col="other_id")


# ----------------------------------------------------------------- lease


def test_lease_blocks_second_writer_and_releases(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("lsh_lease")) + "/idx"
    docs = _docs(spark)
    existing, _ = _split(docs)
    write_lsh_index(existing, path, num_hashes=64, bands=32, n_shards=8)

    lock = acquire_index_lease(spark, path, owner="writer-A")
    with pytest.raises(RuntimeError, match="writer-A"):
        acquire_index_lease(spark, path, owner="writer-B")
    release_index_lease(spark, path, lock)
    lock2 = acquire_index_lease(spark, path, owner="writer-B")
    release_index_lease(spark, path, lock2)


def test_stream_fails_loudly_under_held_lease(spark, tmp_path_factory):
    """Two concurrent ingest loops on one index: the second must fail
    with an actionable error, not silently interleave merges. Writer
    A is simulated by holding the lease while B's stream runs."""
    base = str(tmp_path_factory.mktemp("lsh_lease_stream"))
    idx = f"{base}/idx"
    docs = _docs(spark)
    existing, incoming = _split(docs)
    write_lsh_index(existing, idx, num_hashes=64, bands=32, n_shards=8)
    incoming.write.mode("overwrite").parquet(f"{base}/src")
    stream = spark.readStream.schema(incoming.schema).parquet(f"{base}/src")

    lock = acquire_index_lease(spark, idx, owner="writer-A")
    q = stream_dedup_ingest(
        stream, idx, f"{base}/pairs", f"{base}/ckpt", threshold=0.5
    )
    with pytest.raises(Exception, match="writer-A"):
        q.awaitTermination(120)
        raise AssertionError("stream should have failed under the lease")
    release_index_lease(spark, idx, lock)

    # with the lease free, a fresh run proceeds and cleans up after
    # itself (the lock is gone once the batch lands)
    q2 = stream_dedup_ingest(
        stream, idx, f"{base}/pairs", f"{base}/ckpt2", threshold=0.5
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(f"{base}/pairs").count() > 0
    assert not os.path.exists(f"{idx}/_ingest.lock")


# ---------------------------------------------------- within-batch pairs


def test_stream_detects_within_batch_duplicates(spark, tmp_path_factory):
    """Two near-dup docs arriving in the SAME micro-batch must be
    paired (scope='batch'); cross pairs against the index keep
    scope='cross'; and the union equals the batch ground truth."""
    base = str(tmp_path_factory.mktemp("lsh_within"))
    idx = f"{base}/idx"
    docs = _docs(spark)
    existing, incoming = _split(docs)
    write_lsh_index(existing, idx, num_hashes=64, bands=32, n_shards=8)

    # clone each incoming doc under a fresh id -> guaranteed
    # within-batch near-dups (jaccard 1.0 with its source)
    batch = incoming.unionByName(
        incoming.withColumn("doc_id", F.col("doc_id") + F.lit(10_000_000))
    )
    batch.write.mode("overwrite").parquet(f"{base}/src")
    stream = spark.readStream.schema(batch.schema).parquet(f"{base}/src")
    q = stream_dedup_ingest(
        stream, idx, f"{base}/pairs", f"{base}/ckpt", threshold=0.5
    )
    q.awaitTermination(180)

    pairs = spark.read.parquet(f"{base}/pairs")
    scopes = {r.scope for r in pairs.select("scope").distinct().collect()}
    assert scopes == {"cross", "batch"}
    within = {
        (r.id_a, r.id_b)
        for r in pairs.filter(F.col("scope") == "batch").collect()
    }
    # every clone pairs with its source inside the batch
    src_ids = {r.doc_id for r in incoming.select("doc_id").collect()}
    paired = {a % 10_000_000 for a, _ in within} | {
        b % 10_000_000 for _, b in within
    }
    assert src_ids <= paired
    # cross pairs only link batch ids to pre-existing corpus ids
    cross = pairs.filter(F.col("scope") == "cross")
    batch_ids = {r.doc_id for r in batch.select("doc_id").collect()}
    for r in cross.collect():
        assert r.id_a not in batch_ids and r.id_b in batch_ids


# ------------------------------------------------------ versioned publish


def test_versioned_publish_pointer_flip(spark, tmp_path_factory):
    """publish_index_versioned: readers resolve the pointer; a
    publish lands v=N+1 and flips CURRENT; an already-resolved v=N
    path is never mutated (the object-store-safety property: no
    reader ever observes a mixed index)."""
    base = str(tmp_path_factory.mktemp("lsh_versioned"))
    root = f"{base}/live"
    docs = _docs(spark)
    existing, incoming = _split(docs)

    write_lsh_index(existing, f"{base}/stage1", num_hashes=64, bands=32,
                    n_shards=8)
    v1 = publish_index_versioned(spark, f"{base}/stage1", root)
    assert v1.endswith("/v=1")
    assert resolve_index_path(spark, root) == v1
    n1 = minhash_lsh_index_pairs(spark, root, incoming, threshold=0.5).count()
    assert n1 > 0

    # a reader that resolved BEFORE the next publish: snapshot its
    # file listing — publish must not touch a single byte of v=1
    held = resolve_index_path(spark, root)
    listing_before = {
        os.path.join(dp, f): os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(held)
        for f in fs
    }

    write_lsh_index(
        existing.limit(50), f"{base}/stage2", num_hashes=64, bands=32,
        n_shards=8,
    )
    v2 = publish_index_versioned(spark, f"{base}/stage2", root)
    assert v2.endswith("/v=2")
    assert resolve_index_path(spark, root) == v2

    listing_after = {
        os.path.join(dp, f): os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(held)
        for f in fs
    }
    assert listing_before == listing_after  # old version untouched
    # the held (old-version) path still serves a full consistent probe
    n_old = minhash_lsh_index_pairs(
        spark, held, incoming, threshold=0.5
    ).count()
    assert n_old == n1
    # new readers serve the shrunk v=2
    n2 = minhash_lsh_index_pairs(spark, root, incoming, threshold=0.5).count()
    assert n2 <= n1


def test_versioned_publish_validates_and_half_copied_invisible(
    spark, tmp_path_factory
):
    base = str(tmp_path_factory.mktemp("lsh_versioned_val"))
    root = f"{base}/live"
    docs = _docs(spark)
    existing, incoming = _split(docs)
    write_lsh_index(existing, f"{base}/stage1", num_hashes=64, bands=32,
                    n_shards=8)
    publish_index_versioned(spark, f"{base}/stage1", root)
    n1 = minhash_lsh_index_pairs(spark, root, incoming, threshold=0.5).count()

    # a botched build (no meta.json) must be refused BEFORE the flip
    os.makedirs(f"{base}/broken/bands", exist_ok=True)
    with pytest.raises(ValueError, match="meta.json"):
        publish_index_versioned(spark, f"{base}/broken", root)

    # simulate an in-progress copy-based "rename" on an object store:
    # a half-written v=99 directory sits under the root WITHOUT the
    # pointer having flipped — readers must keep resolving v=1
    os.makedirs(f"{root}/v=99/bands", exist_ok=True)
    with open(f"{root}/v=99/garbage", "w") as fh:
        fh.write("partial copy")
    assert resolve_index_path(spark, root).endswith("/v=1")
    assert (
        minhash_lsh_index_pairs(spark, root, incoming, threshold=0.5).count()
        == n1
    )


def test_gc_index_versions_keeps_newest(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("lsh_gc"))
    root = f"{base}/live"
    docs = _docs(spark)
    existing, _ = _split(docs)
    for i in range(3):
        write_lsh_index(
            existing.limit(40 + 10 * i), f"{base}/s{i}",
            num_hashes=64, bands=16, n_shards=4,
        )
        publish_index_versioned(spark, f"{base}/s{i}", root)
    deleted = gc_index_versions(spark, root, keep=2)
    assert deleted == [f"{root}/v=1"]
    assert not os.path.exists(f"{root}/v=1")
    assert resolve_index_path(spark, root).endswith("/v=3")
    assert read_index_meta(spark, resolve_index_path(spark, root))


def test_pq_index_serves_through_versioned_root(spark, tmp_path_factory):
    """The IVF-PQ probe resolves the same pointer scheme: publish the
    pq index under a versioned root and serve from the root path."""
    from trisk_datawrangle_spark.llm.pq_index import (
        ivf_pq_index_topk,
        write_ivf_pq_index,
    )

    base = str(tmp_path_factory.mktemp("pq_versioned"))
    root = f"{base}/live"
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    queries = emb.filter(F.col("vec_id") % 10 == 0).limit(5)
    write_ivf_pq_index(corpus, f"{base}/stage", n_cells=8, m=4)
    publish_index_versioned(spark, f"{base}/stage", root)
    got = ivf_pq_index_topk(spark, root, queries, k=3, n_probe=2)
    assert got.count() == 5 * 3
    direct = ivf_pq_index_topk(
        spark, resolve_index_path(spark, root), queries, k=3, n_probe=2
    )
    assert {tuple(r) for r in got.collect()} == {
        tuple(r) for r in direct.collect()
    }


def test_incremental_parity_still_holds_after_hardening(
    spark, tmp_path_factory
):
    """The anti-join + checkpoint changes must not move the probe's
    results: index probe == inline incremental derivation, same as
    the original r6 contract."""
    path = str(tmp_path_factory.mktemp("lsh_parity")) + "/idx"
    docs = _docs(spark)
    existing, incoming = _split(docs)
    write_lsh_index(existing, path, num_hashes=64, bands=32)
    got = {
        (r.id_a, r.id_b): round(r.jaccard, 12)
        for r in minhash_lsh_index_pairs(
            spark, path, incoming, threshold=0.5
        ).collect()
    }
    ref = {
        (r.id_a, r.id_b): round(r.jaccard, 12)
        for r in minhash_lsh_incremental_pairs(
            existing, incoming, num_hashes=64, bands=32, threshold=0.5
        ).collect()
    }
    assert got == ref and got


def test_corrupt_pointer_fails_loudly(spark, tmp_path_factory):
    """A corrupt/partial CURRENT pointer must raise, never fall back
    to some version silently — the read-side guard of the
    retrain-and-swap lifecycle (r7 verdict #5)."""
    base = str(tmp_path_factory.mktemp("lsh_corrupt_ptr"))
    root = f"{base}/live"
    docs = _docs(spark)
    existing, incoming = _split(docs)
    write_lsh_index(existing, f"{base}/stage1", num_hashes=64, bands=32,
                    n_shards=8)
    publish_index_versioned(spark, f"{base}/stage1", root)

    def _scribble(content: str) -> None:
        # out-of-band corruption: drop the Hadoop local-FS checksum
        # sidecar so the read itself succeeds and resolve's OWN
        # validation is what fires (the object-store case, where no
        # CRC sidecar exists)
        crc = f"{root}/.CURRENT.crc"
        if os.path.exists(crc):
            os.remove(crc)
        with open(f"{root}/CURRENT", "w") as fh:
            fh.write(content)

    for bad in ("", "../evil", ".hidden", "v=1/extra"):
        _scribble(bad)
        with pytest.raises(ValueError, match="corrupt pointer"):
            resolve_index_path(spark, root)
        # the probe path goes through the same resolve — loud too
        with pytest.raises(ValueError, match="corrupt pointer"):
            minhash_lsh_index_pairs(
                spark, root, incoming, threshold=0.5
            ).count()
    # a torn write on a checksummed FS (stale CRC sidecar) is loud
    # as well — just via the filesystem's own integrity error
    with open(f"{root}/CURRENT", "w") as fh:
        fh.write("v=9999")
    if os.path.exists(f"{root}/.CURRENT.crc"):
        with pytest.raises(Exception):
            resolve_index_path(spark, root)
    # restoring the pointer restores service
    _scribble("v=1")
    assert resolve_index_path(spark, root).endswith("/v=1")


def test_serving_entries_publish_versioned_root(spark, tmp_path, monkeypatch):
    """The catalog serving entries build through
    publish_index_versioned into a stable root and probe via the
    CURRENT pointer: first call publishes v=1, a fresh process
    (cleared memo) REUSES it instead of rebuilding, and the probe
    keeps serving across a pointer re-publish."""
    import trisk_datawrangle_spark.catalog.llm as cat

    monkeypatch.setenv("SPARK_GRAFT_SERVING_DIR", str(tmp_path))
    monkeypatch.setattr(cat, "_SERVING_INDEX_CACHE", {})

    builds = []

    def build(staged):
        builds.append(staged)
        docs = _docs(spark)
        write_lsh_index(docs.filter(F.col("doc_id") % 2 == 0), staged,
                        num_hashes=64, bands=32, n_shards=8)

    root = cat._served_index_path(spark, "lsh", SF_DIR, build)
    assert len(builds) == 1
    assert os.path.exists(os.path.join(root, "CURRENT"))
    assert resolve_index_path(spark, root).endswith("/v=1")

    # fresh memo = new process: must find the published version
    monkeypatch.setattr(cat, "_SERVING_INDEX_CACHE", {})
    root2 = cat._served_index_path(spark, "lsh", SF_DIR, build)
    assert root2 == root and len(builds) == 1

    docs = _docs(spark)
    incoming = docs.filter(F.col("doc_id") % 2 == 1)
    n1 = minhash_lsh_index_pairs(spark, root, incoming,
                                 threshold=0.5).count()
    assert n1 > 0
