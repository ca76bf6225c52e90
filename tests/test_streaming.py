"""Structured Streaming tests: real streaming queries over file sources
with availableNow triggers + memory sinks."""

import os
import time

import pytest
from pyspark.sql import functions as F

from customer_er_spark.config import ERConfig

CFG = ERConfig(shuffle_partitions=8)


def _wait(query, timeout=120):
    query.awaitTermination(timeout)
    if query.isActive:
        query.stop()
        raise AssertionError("streaming query did not finish in time")


def test_windowed_event_agg_stream(spark, tmp_path):
    from customer_er_spark.streaming.streams import windowed_event_agg

    src = str(tmp_path / "events_src")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.write.parquet(src)

    stream = (
        spark.readStream.schema(events.schema)
        .parquet(src)
    )
    agg = windowed_event_agg(stream, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_agg")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _wait(q)
    got = spark.table("win_agg")
    # batch oracle: same computation without watermarks
    want = (
        events.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("n"))
        .count()
    )
    # append mode only emits windows the watermark has passed; the final
    # window may be withheld — allow <= and a sanity floor
    assert 0 < got.count() <= want
    assert set(got.columns) == {
        "window_start", "window_end", "event_type", "n", "sum_value",
    }


def test_exact_dedup_stream(spark, tmp_path):
    from customer_er_spark.streaming.streams import exact_dedup_stream

    src = str(tmp_path / "docs_src")
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .withColumn("ts", F.current_timestamp())
    )
    # duplicate every doc once -> stream must emit each text exactly once
    docs.union(docs).write.parquet(src)

    stream = spark.readStream.schema(
        docs.schema
    ).parquet(src)
    q = (
        exact_dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _wait(q)
    got = spark.table("dedup_stream")
    n_texts = docs.select("text").distinct().count()
    assert got.count() == n_texts
    assert got.select("text_hash").distinct().count() == n_texts


def test_stream_images_to_registry(spark, small_corpus, tmp_path):
    from customer_er_spark.catalog import SparkCatalog
    from customer_er_spark.plans.pipeline import recall_vs_truth
    from customer_er_spark.streaming.streams import stream_images_to_registry

    src = str(tmp_path / "img_src")
    os.makedirs(src)
    images = spark.read.parquet(f"{small_corpus['dir']}/images.parquet")
    # two files -> at least two micro-batches (maxFilesPerTrigger=4 caps it)
    initial = spark.read.parquet(f"{small_corpus['dir']}/images_initial.parquet")
    incremental = spark.read.parquet(
        f"{small_corpus['dir']}/images_incremental.parquet"
    )
    initial.coalesce(1).write.parquet(src + "/batch0")
    # file source needs a flat dir of files; write parts directly
    import glob
    import shutil

    for i, part in enumerate(glob.glob(src + "/batch0/*.parquet")):
        shutil.move(part, src + f"/a{i}.parquet")
    shutil.rmtree(src + "/batch0")

    catalog = SparkCatalog(spark, str(tmp_path / "cat"))
    q = stream_images_to_registry(
        spark, src, catalog, CFG, str(tmp_path / "ckpt")
    )
    _wait(q, 600)
    assert catalog.read_table("cluster_members").count() == initial.count()

    # drop the incremental file in and run a second availableNow pass
    incremental.coalesce(1).write.parquet(src + "/batch1")
    for i, part in enumerate(glob.glob(src + "/batch1/*.parquet")):
        shutil.move(part, src + f"/b{i}.parquet")
    shutil.rmtree(src + "/batch1")

    q2 = stream_images_to_registry(
        spark, src, catalog, CFG, str(tmp_path / "ckpt")
    )
    _wait(q2, 600)
    members = catalog.read_table("cluster_members")
    assert members.count() == small_corpus["rows"]
    truth = spark.read.parquet(f"{small_corpus['dir']}/truth_pairs.parquet")
    m = recall_vs_truth(spark, members, truth)
    assert m["recall"] >= 0.99, m


def test_stateful_dedup_counts(spark, tmp_path):
    """applyInPandasWithState: per-key (n_copies, keep_id) state must
    accumulate ACROSS restarted queries via the stream checkpoint."""
    from customer_er_spark.streaming.streams import stateful_dedup_counts

    src = str(tmp_path / "sd_src")
    ckpt = str(tmp_path / "sd_ckpt")
    os.makedirs(src)
    rows1 = [(10, "alpha text"), (11, "alpha text"), (12, "beta text")]
    rows2 = [(5, "alpha text"), (13, "gamma text")]
    schema = "doc_id long, text string"
    spark.createDataFrame(rows1, schema).write.parquet(f"{src}/b1")

    def run(qname):
        # foreachBatch sink: the memory sink refuses checkpoint recovery,
        # and recovery is exactly what this test exercises
        updates = []

        def sink(batch_df, batch_id):
            updates.extend(batch_df.collect())

        stream = spark.readStream.schema(
            spark.createDataFrame([], schema).schema
        ).option("maxFilesPerTrigger", "1").parquet(f"{src}/*")
        q = (
            stateful_dedup_counts(stream)
            .writeStream.foreachBatch(sink)
            .queryName(qname)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _wait(q)
        out = {}
        for r in sorted(updates, key=lambda r: r["n_copies"]):
            out[r["text_hash"]] = r  # last update per key wins
        return out

    got1 = run("sd1")
    by_copies1 = sorted((r["n_copies"], r["keep_id"]) for r in got1.values())
    assert by_copies1 == [(1, 12), (2, 10)]

    # second batch arrives; a FRESH query on the same checkpoint resumes
    # the stored per-key state — alpha grows to 3 copies and the survivor
    # flips to the new global NUMERIC minimum 10 -> 5 (native-type min,
    # matching batch exact_dedup; string order would keep "10")
    spark.createDataFrame(rows2, schema).write.parquet(f"{src}/b2")
    got2 = run("sd2")
    by_copies2 = sorted((r["n_copies"], r["keep_id"]) for r in got2.values())
    assert (3, 5) in by_copies2  # 2 prior + 1 new; numeric min wins
    assert (1, 13) in by_copies2  # new key emitted with fresh state


def test_stateful_census_matches_exact_dedup_oracle(spark, tmp_path):
    """Value-level oracle for the stateful streaming census: run it over
    the driver's sf0.001 documents table as an availableNow stream in
    several micro-batches; the final per-key state must equal the batch
    exact_dedup aggregate EXACTLY — (text_hash, n_copies, keep_id) sets,
    not just row counts."""
    from customer_er_spark.operators.dedup import exact_dedup
    from customer_er_spark.streaming.streams import stateful_dedup_counts

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    expected = {
        (r["text_hash"], r["n_copies"], r["keep_id"])
        for r in exact_dedup(docs).collect()
    }
    assert expected  # non-vacuous

    src = str(tmp_path / "census_src")
    docs.repartition(6).write.parquet(src)  # several micro-batches

    updates = []

    def sink(batch_df, batch_id):
        updates.extend(batch_df.collect())

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(src)
    )
    q = (
        stateful_dedup_counts(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "census_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _wait(q)

    final = {}
    for r in updates:  # updates arrive in batch order; last per key wins
        final[r["text_hash"]] = (r["text_hash"], r["n_copies"], r["keep_id"])
    got = set(final.values())
    assert got == expected
