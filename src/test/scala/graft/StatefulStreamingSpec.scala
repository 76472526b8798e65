package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.cdc.ChangeEvents
import graft.functions.ExtJson.{ext_json_canonical, ext_json_get}
import graft.streaming.{DeliveryReportListener, StatefulOps}

/** Stateful streaming semantics: latest-state materialization across
  * micro-batches (insert → update → delete), the delivery-report
  * listener, and ExtJSON read-back.
  */
class StatefulStreamingSpec extends SparkSpec {

  private def ev(op: String, key: String, doc: String, ts: String): String =
    s"""{"_id":"x","operationType":"$op","clusterTime":"$ts",""" +
      s""""ns":{"db":"app","coll":"c"},"documentKey":"$key",""" +
      s""""fullDocument":"$doc"}"""

  test("latest-state folds insert/update/delete across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val envelope = ChangeEvents.parseEnvelope(input.toDF(), "value")
    val state = StatefulOps.latestState(envelope)

    val q = state.toDF().writeStream.format("memory").queryName("state_out")
      .outputMode("update").start()
    input.addData(
      ev("insert", "k1", "v1", "2024-01-01T00:00:00Z"),
      ev("insert", "k2", "v1", "2024-01-01T00:00:01Z"))
    q.processAllAvailable()
    input.addData(ev("update", "k1", "v2", "2024-01-01T00:01:00Z"))
    q.processAllAvailable()
    input.addData(ev("delete", "k2", "", "2024-01-01T00:02:00Z"))
    q.processAllAvailable()
    q.stop()

    // last emitted state per key across the update-mode epochs
    val finalState = spark.table("state_out")
      .groupBy("documentKey")
      .agg(max(struct(col("lastEventTimeMs"), col("lastOp"), col("fullDocument"))).as("s"))
      .select(col("documentKey"), col("s.lastOp"), col("s.fullDocument"))
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(finalState("k1") === ("update", "v2"))
    assert(finalState("k2")._1 === "delete")
  }

  test("foreachBatch MERGE sink maintains the snapshot across epochs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val snap = java.nio.file.Files.createTempDirectory("merge_snap")
      .resolve("snapshot").toString
    val input = MemoryStream[String]
    val envelope = ChangeEvents.parseEnvelope(input.toDF(), "value")
    val state = StatefulOps.latestState(envelope)
    val q = state.toDF().writeStream
      .outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.streaming.MergeSink.applyBatch(spark, snap, batch,
          keyCol = "documentKey", opCol = "lastOp", deleteOp = "delete")
      }.start()

    def snapshot(): Map[String, String] =
      spark.read.parquet(snap).select("documentKey", "fullDocument")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap

    input.addData(
      ev("insert", "k1", "v1", "2024-01-01T00:00:00Z"),
      ev("insert", "k2", "v1", "2024-01-01T00:00:01Z"))
    q.processAllAvailable()
    assert(snapshot() === Map("k1" -> "v1", "k2" -> "v1"))

    input.addData(ev("update", "k1", "v2", "2024-01-01T00:01:00Z"))
    q.processAllAvailable()
    assert(snapshot() === Map("k1" -> "v2", "k2" -> "v1"))

    input.addData(ev("delete", "k2", "", "2024-01-01T00:02:00Z"))
    q.processAllAvailable()
    q.stop()
    // same semantics as the batch cdc_merge_apply: upsert on document
    // ops, DELETE on tombstones, untouched rows pass through
    assert(snapshot() === Map("k1" -> "v2"))
    graft.operators.Artifacts.deleteRecursively(
      java.nio.file.Paths.get(snap).getParent)
  }

  test("transformWithState latest-state matches the flatMapGroupsWithState fold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[String]
      val envelope = ChangeEvents.parseEnvelope(input.toDF(), "value")
      val state = graft.streaming.LatestStateProcessor.latestState(envelope)

      val q = state.toDF().writeStream.format("memory").queryName("tws_out")
        .outputMode("update").start()
      input.addData(ev("insert", "k1", "v1", "2024-01-01T00:00:00Z"))
      q.processAllAvailable()
      input.addData(
        ev("update", "k1", "v2", "2024-01-01T00:01:00Z"),
        ev("insert", "k2", "w1", "2024-01-01T00:01:30Z"))
      q.processAllAvailable()
      input.addData(ev("delete", "k1", "", "2024-01-01T00:02:00Z"))
      q.processAllAvailable()
      q.stop()

      val finalState = spark.table("tws_out")
        .groupBy("documentKey")
        .agg(max(struct(col("lastEventTimeMs"), col("lastOp"), col("fullDocument"))).as("s"))
        .select(col("documentKey"), col("s.lastOp"), col("s.fullDocument"))
        .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
      assert(finalState("k1")._1 === "delete")
      assert(finalState("k2") === ("insert", "w1"))
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("latest-state parses fixture-shaped ExtJSON clusterTime ($timestamp / $date)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val envelope = ChangeEvents.parseEnvelope(input.toDF(), "value")
    val state = StatefulOps.latestState(envelope)
    val q = state.toDF().writeStream.format("memory").queryName("exts_out")
      .outputMode("update").start()
    // FIXTURES.md §1: clusterTime is canonical ExtJSON, not ISO text
    input.addData(
      ev("insert", "k1", "v1", """{\"$timestamp\":{\"t\":1704067200,\"i\":1}}"""),
      ev("update", "k1", "v2", """{\"$timestamp\":{\"t\":1704067260,\"i\":1}}"""),
      ev("insert", "k2", "w1", """{\"$date\":{\"$numberLong\":\"1704067300000\"}}"""))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("exts_out")
      .groupBy("documentKey")
      .agg(max(struct(col("lastEventTimeMs"), col("lastOp"), col("fullDocument"))).as("s"))
      .select(col("documentKey"), col("s.lastOp"), col("s.lastEventTimeMs"))
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(rows("k1") === ("update", 1704067260000L))
    assert(rows("k2") === ("insert", 1704067300000L))
  }

  test("unparseable clusterTime dead-letters instead of crashing the encoder") {
    import spark.implicits._
    val envelope = ChangeEvents.parseEnvelope(
      Seq(
        ev("insert", "k1", "v1", "2024-01-01T00:00:00Z"),
        ev("insert", "k2", "v1", "not-a-time-at-all")).toDF("value"), "value")
    val dead = StatefulOps.latestStateDeadLetter(envelope).collect()
    assert(dead.length === 1)
    assert(dead.head.getAs[String]("documentKey") === "k2")
  }

  test("delivery-report listener observes per-epoch input rows (main.go:50-62 analog)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val listener = new DeliveryReportListener
    spark.streams.addListener(listener)
    try {
      val input = MemoryStream[String]
      val envelope = ChangeEvents.parseEnvelope(input.toDF(), "value")
      val q = ChangeEvents.relay(envelope).writeStream
        .format("memory").queryName("listener_out").outputMode("append").start()
      input.addData(ev("insert", "k1", "v1", "2024-01-01T00:00:00Z"))
      q.processAllAvailable(); q.stop()
      // at least one progress report with the input row counted
      assert(listener.reports.toArray.nonEmpty)
    } finally spark.streams.removeListener(listener)
  }

  test("ext_json_get unwraps what ext_json_canonical wrapped (round trip)") {
    val rendered = ext_json_canonical(struct(
      lit(42L).as("_id"),
      lit("name").as("s"),
      lit("2024-01-01 00:00:00").cast("timestamp").as("d")))
    val df = spark.range(1).select(rendered.as("j"))
    val got = df.select(
      ext_json_get(col("j"), "$._id").as("id"),
      ext_json_get(col("j"), "$.s").as("s"),
      ext_json_get(col("j"), "$.d").as("d")).head()
    assert(got.getString(0) === "42")
    assert(got.getString(1) === "name")
    assert(got.getString(2) === "1704067200000")
  }
}
