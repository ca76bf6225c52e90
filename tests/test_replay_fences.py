"""Crash/replay fences — regression tests for the round-2 advice findings:

  1. run_link must NOT resume on a STALE link_decisions table (crash after
     the incoming_signatures commit, before the downstream commits);
  2. a fully-applied run_incremental_match replay is O(1): the within-
     incoming candidate/verify/CC compute must not run at all;
  3. a replayed BOOTSTRAP micro-batch resumes run_initial instead of
     falling into the link path (which would self-link the registry's own
     records and double-append every image_id).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from customer_er_spark.config import ERConfig
from customer_er_spark.plans.incremental import run_incremental_match, run_link
from customer_er_spark.plans.pipeline import run_initial

CFG = ERConfig(shuffle_partitions=8)


@pytest.fixture(scope="module")
def split_corpus(spark, small_corpus):
    d = small_corpus["dir"]
    initial = spark.read.parquet(f"{d}/images_initial.parquet")
    incoming = spark.read.parquet(f"{d}/images_incremental.parquet")
    # two disjoint incoming halves = two distinct micro-batches
    inc1 = incoming.where(F.crc32("image_id") % 2 == 0)
    inc2 = incoming.where(F.crc32("image_id") % 2 == 1)
    return initial, inc1, inc2


def test_stale_link_decisions_not_resumed(spark, split_corpus, tmp_path):
    from customer_er_spark.catalog import SparkCatalog
    from customer_er_spark.operators.signatures import compute_signatures

    initial, inc1, inc2 = split_corpus
    catalog = SparkCatalog(spark, str(tmp_path / "cat"))
    run_initial(spark, initial, catalog, CFG)
    s1 = run_link(spark, inc1, catalog, CFG, run_key="b1")
    assert not s1["resumed"]
    run_incremental_match(spark, inc1, catalog, CFG)

    # simulate the crash window: batch b2's incoming_signatures commits,
    # process dies before link_candidates/link_edges/link_decisions —
    # link_decisions still holds b1's output
    sig2 = compute_signatures(inc2, CFG)
    catalog.write_table(
        sig2, "incoming_signatures", config_hash=CFG.config_hash(),
        inputs={"run_key": "b2"},
    )
    dec_before = catalog.snapshot_id("link_decisions")

    # the replay of b2 must RECOMPUTE (old code resumed on table existence
    # and merged b2 using b1's stale decisions)
    s2 = run_link(spark, inc2, catalog, CFG, run_key="b2")
    assert not s2["resumed"]
    assert catalog.snapshot_id("link_decisions") != dec_before
    dec = catalog.table_meta("link_decisions")
    assert dec["inputs"]["run_key"] == "b2"
    assert dec["inputs"]["incoming_signatures"] == catalog.snapshot_id(
        "incoming_signatures"
    )

    # a true replay (everything committed) DOES resume without new snapshots
    dec_snap = catalog.snapshot_id("link_decisions")
    s3 = run_link(spark, inc2, catalog, CFG, run_key="b2")
    assert s3["resumed"]
    assert catalog.snapshot_id("link_decisions") == dec_snap


def test_incremental_replay_skips_compute(spark, split_corpus, tmp_path, monkeypatch):
    from customer_er_spark.catalog import SparkCatalog
    from customer_er_spark.plans import incremental as inc_mod

    initial, inc1, _ = split_corpus
    catalog = SparkCatalog(spark, str(tmp_path / "cat"))
    run_initial(spark, initial, catalog, CFG)
    run_link(spark, inc1, catalog, CFG, run_key="b1")
    first = run_incremental_match(spark, inc1, catalog, CFG)
    assert "resumed" not in first

    def boom(*a, **kw):  # the replay fast-path must never reach compute
        raise AssertionError("candidate generation ran on a replayed merge")

    monkeypatch.setattr(inc_mod, "candidate_pairs", boom)
    monkeypatch.setattr(inc_mod, "verify_pairs", boom)
    replay = run_incremental_match(spark, inc1, catalog, CFG)
    assert replay["resumed"]
    assert {k: replay[k] for k in first} == first
    # the durable CC working table was cleaned up after the merge
    assert catalog.table_meta("cc_edges_incremental") is None


def test_bootstrap_batch_replay_is_idempotent(spark, split_corpus, tmp_path):
    from customer_er_spark.catalog import SparkCatalog
    from customer_er_spark.streaming.streams import (
        BOOTSTRAP,
        FENCE,
        process_registry_batch,
    )

    initial, inc1, _ = split_corpus
    catalog = SparkCatalog(spark, str(tmp_path / "cat"))
    process_registry_batch(spark, initial, 0, catalog, CFG)
    assert catalog.get_state(BOOTSTRAP) == 0
    members0 = catalog.read_table("cluster_members")
    n0 = members0.count()
    assert members0.groupBy("image_id").count().where("count > 1").count() == 0

    # crash window: run_initial committed, the batch fence did not
    catalog.set_state(FENCE, -1)
    process_registry_batch(spark, initial, 0, catalog, CFG)
    members1 = catalog.read_table("cluster_members")
    assert members1.count() == n0  # no duplicate image_ids appended
    assert members1.groupBy("image_id").count().where("count > 1").count() == 0
    assert catalog.get_state(FENCE, -1) == 0

    # normal follow-up batch still takes the incremental path
    process_registry_batch(spark, inc1, 1, catalog, CFG)
    members2 = catalog.read_table("cluster_members")
    assert members2.count() == n0 + inc1.count()
    assert members2.groupBy("image_id").count().where("count > 1").count() == 0
