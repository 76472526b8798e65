package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.functions.{Kmv, KmvAggregator}
import graft.streaming.SketchBankSink

/** [[SketchBankSink]]'s contract: the streamed per-(type, day) KMV
  * bank is BIT-EQUAL to a one-shot batch build over the same events
  * (merge losslessness across arbitrary micro-batch splits), a
  * replayed epoch folds to a no-op (the algebraic exactly-once that
  * replaces AggSink's `_EPOCH` marker), and a crash-restart from the
  * checkpoint converges to the same bank.
  */
class SketchBankStreamingSpec extends SparkSpec {

  private val schema = "event_type STRING, ts TIMESTAMP, user_id LONG"

  /** 12 files × 25 events; users recur across files and days so
    * cross-batch sketch unions are the common case, not the edge.
    */
  private def writeSource(src: String): Unit =
    for (f <- 0 until 12)
      Files.writeString(java.nio.file.Paths.get(s"$src/f$f.json"),
        (0 until 25).map { i =>
          val id = f * 25 + i
          val day = 1 + (id % 3)                  // 3 distinct days
          val typ = if (id % 2 == 0) "click" else "view"
          s"""{"event_type":"$typ","ts":"2024-02-0$day 0${id % 10}:00:00","user_id":${id % 40}}"""
        }.mkString("\n"))

  private def batchTruth(src: String): Map[(String, java.sql.Timestamp), Seq[Long]] = {
    val kmv = udaf(new KmvAggregator(Kmv.Capacity), ExpressionEncoder[Long]())
    spark.read.schema(schema).json(src)
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"),
        Kmv.hash64(col("user_id")).as("h"))
      .groupBy("event_type", "day").agg(kmv(col("h")).as("sk"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1)) -> r.getSeq[Long](2))
      .toMap
  }

  private def bankRows(bank: String): Map[(String, java.sql.Timestamp), Seq[Long]] =
    SketchBankSink.read(spark, bank).collect()
      .map(r => (r.getString(r.fieldIndex("event_type")),
        r.getTimestamp(r.fieldIndex("day"))) ->
        r.getSeq[Long](r.fieldIndex("sk"))).toMap

  private def start(src: String, bank: String, chk: String, trigger: Trigger) =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(src)
      .writeStream.option("checkpointLocation", chk)
      .trigger(trigger)
      .foreachBatch { (b: DataFrame, _: Long) =>
        SketchBankSink.applyBatch(spark, bank, b)
      }.start()

  test("streamed bank is bit-equal to the one-shot batch build " +
      "(lossless union across arbitrary micro-batch splits)") {
    val src = Files.createTempDirectory("skbank_src").toString
    val bank = Files.createTempDirectory("skbank_root").toString + "/bank"
    val chk = Files.createTempDirectory("skbank_chk").toString
    writeSource(src)
    start(src, bank, chk, Trigger.AvailableNow()).awaitTermination()
    val got = bankRows(bank)
    val want = batchTruth(src)
    assert(got.keySet === want.keySet)
    for ((k, sk) <- want) assert(got(k) === sk, s"sketch mismatch at $k")
  }

  test("replayed epoch is a NO-OP: re-folding the whole corpus leaves " +
      "every sketch array unchanged (exactly-once by algebra)") {
    val src = Files.createTempDirectory("skbank2_src").toString
    val bank = Files.createTempDirectory("skbank2_root").toString + "/bank"
    val chk = Files.createTempDirectory("skbank2_chk").toString
    writeSource(src)
    start(src, bank, chk, Trigger.AvailableNow()).awaitTermination()
    val before = bankRows(bank)
    // worst-case replay: every event re-delivered at once
    SketchBankSink.applyBatch(spark, bank, spark.read.schema(schema).json(src))
    assert(bankRows(bank) === before)
  }

  test("CONCURRENT writers serialize under the bank dir lock and " +
      "converge to the batch truth (fold commutativity + mutual exclusion)") {
    val src = Files.createTempDirectory("skbank4_src").toString
    val bank = Files.createTempDirectory("skbank4_root").toString + "/bank"
    writeSource(src)
    val full = spark.read.schema(schema).json(src).cache()
    full.count()
    // 6 overlapping slices folded from 3 threads at once — every pair
    // of folds races on the same swap-managed dir; the lock serializes
    // them and commutativity makes every interleaving equivalent
    val slices = (0 until 6).map(i => full.filter(col("user_id") % 6 <= i))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val folds = slices.grouped(2).toSeq.map { pair =>
      Future { pair.foreach(b => SketchBankSink.applyBatch(spark, bank, b)) }
    }
    Await.result(Future.sequence(folds), 120.seconds)
    full.unpersist()
    val got = bankRows(bank)
    val want = batchTruth(src) // union of slices covers every event
    assert(got.keySet === want.keySet)
    for ((k, sk) <- want) assert(got(k) === sk, s"sketch mismatch at $k")
  }

  test("crash-resume: restart from the checkpoint converges to the " +
      "batch-truth bank") {
    val src = Files.createTempDirectory("skbank3_src").toString
    val bank = Files.createTempDirectory("skbank3_root").toString + "/bank"
    val chk = Files.createTempDirectory("skbank3_chk").toString
    writeSource(src)
    val q1 = start(src, bank, chk, Trigger.ProcessingTime("1 second"))
    val deadline = System.nanoTime() + 60e9.toLong
    while (q1.recentProgress.count(_.numInputRows > 0) < 1
        && System.nanoTime() < deadline) Thread.sleep(50)
    q1.stop() // the crash: offsets live only in the checkpoint
    start(src, bank, chk, Trigger.AvailableNow()).awaitTermination()
    val got = bankRows(bank)
    val want = batchTruth(src)
    assert(got.keySet === want.keySet)
    for ((k, sk) <- want) assert(got(k) === sk, s"sketch mismatch at $k")
  }
}
