"""Incremental link + match: end-to-end over the datagen 4/5 - 1/5 split
(mirrors /root/reference/01_Prepare_Data.py:117-129)."""

import pytest
from pyspark.sql import functions as F

from customer_er_spark.config import ERConfig
from customer_er_spark.plans.incremental import run_incremental_match, run_link
from customer_er_spark.plans.pipeline import recall_vs_truth, run_initial

CFG = ERConfig(shuffle_partitions=8)


@pytest.fixture(scope="module")
def incremental_run(spark, small_corpus, tmp_path_factory):
    from customer_er_spark.catalog import SparkCatalog

    catalog = SparkCatalog(spark, str(tmp_path_factory.mktemp("inc_cat")))
    initial = spark.read.parquet(f"{small_corpus['dir']}/images_initial.parquet")
    incoming = spark.read.parquet(
        f"{small_corpus['dir']}/images_incremental.parquet"
    )
    run_initial(spark, initial, catalog, CFG)
    link_summary = run_link(spark, incoming, catalog, CFG)
    match_summary = run_incremental_match(spark, incoming, catalog, CFG)
    return catalog, link_summary, match_summary


def test_linked_output_shape(incremental_run):
    catalog, link_summary, _ = incremental_run
    linked = catalog.read_table("linked")
    assert set(linked.columns) == {"image_id", "z_cluster", "z_score", "z_source"}
    assert set(
        r["z_source"] for r in linked.select("z_source").distinct().collect()
    ) <= {"priors", "incoming"}
    # a prior's z_score is the max over its incoming matches: no incoming
    # edge in the same link group may exceed the prior row's score
    pri = linked.where("z_source = 'priors'").groupBy("z_cluster").agg(
        F.max("z_score").alias("pmax")
    )
    inc = linked.where("z_source = 'incoming'").groupBy("z_cluster").agg(
        F.max("z_score").alias("imax")
    )
    bad = pri.join(inc, "z_cluster").where("imax > pmax").count()
    assert bad == 0


def test_decisions_partition_incoming(incremental_run):
    catalog, link_summary, _ = incremental_run
    d = catalog.read_table("link_decisions")
    assert d.groupBy("image_id").count().where("count > 1").count() == 0
    vals = {r["decision"] for r in d.select("decision").distinct().collect()}
    assert vals <= {"accept", "review", "reject"}


def test_full_recall_after_incremental(spark, small_corpus, incremental_run):
    catalog, _, match_summary = incremental_run
    truth = spark.read.parquet(f"{small_corpus['dir']}/truth_pairs.parquet")
    members = catalog.read_table("cluster_members")
    # every record (initial + incoming) present exactly once
    assert members.count() == small_corpus["rows"]
    m = recall_vs_truth(spark, members, truth)
    assert m["recall"] >= 0.99, m
    assert m["precision"] >= 0.95, m


def test_registry_ids_stable_across_increment(spark, small_corpus, incremental_run):
    catalog, _, _ = incremental_run
    # clusters that existed after the initial run keep their ids: every
    # initial-era member still maps to its old cluster id
    initial_ids = {
        r["image_id"]
        for r in spark.read.parquet(
            f"{small_corpus['dir']}/images_initial.parquet"
        ).select("image_id").collect()
    }
    members = catalog.read_table("cluster_members")
    # initial-era cluster ids are always initial-era image ids (min of the
    # original component); incoming can only join them, not rename them
    moved = members.where(
        F.col("image_id").isin(list(initial_ids))
        & ~F.col("cluster_id").isin(list(initial_ids))
    ).count()
    assert moved == 0
