package graft

import org.apache.spark.sql.functions._

import graft.operators.Compaction

/** Compaction must shrink a many-small-files directory to the computed
  * target without changing a single row — including on the real shape
  * that produces the problem: a streaming sink's per-epoch appends.
  */
class CompactionSpec extends SparkSpec {

  test("epoch-fragmented parquet compacts to right-sized files, rows intact") {
    val dir = java.nio.file.Files.createTempDirectory("compaction_spec")
      .resolve("table").toString
    // simulate 20 micro-batch appends of 500 rows each — the file
    // pattern a Trigger.AvailableNow relay leaves behind
    (0 until 20).foreach { epoch =>
      spark.range(epoch * 500, (epoch + 1) * 500)
        .select(col("id"), (col("id") % 7).as("k"))
        .coalesce(1).write.mode("append").parquet(dir)
    }
    val checksumBefore = spark.read.parquet(dir)
      .agg(count(lit(1)), sum("id"), sum("k")).collect()(0)

    val (before, after) = Compaction.compact(spark, dir, rowsPerFile = 2500L)
    assert(before === 20, s"expected 20 epoch files, found $before")
    assert(after === 4, s"10000 rows at 2500/file must compact to 4, got $after")

    val checksumAfter = spark.read.parquet(dir)
      .agg(count(lit(1)), sum("id"), sum("k")).collect()(0)
    assert(checksumAfter === checksumBefore, "compaction altered the data")

    graft.operators.Artifacts.deleteRecursively(
      java.nio.file.Paths.get(dir).getParent)
  }

  test("compaction racing streaming MERGE batches loses no rows (shared dir lock)") {
    val snap = java.nio.file.Files.createTempDirectory("merge_compact_race")
      .resolve("snapshot").toString
    def batch(lo: Long, hi: Long) = spark.range(lo, hi)
      .select(col("id").cast("string").as("documentKey"),
        lit("update").as("lastOp"),
        concat(lit("v"), col("id")).as("fullDocument"))
    graft.streaming.MergeSink.applyBatch(spark, snap, batch(0, 100),
      "documentKey", "lastOp", "delete")
    // a compactor hammers the directory while MERGE batches land: the
    // shared withDirLock must serialize them — before the lock, any file
    // appended between compact's snapshot and its swap was silently lost
    @volatile var err: Throwable = null
    val compactor = new Thread(() => try {
      for (_ <- 1 to 4)
        graft.operators.Compaction.compact(spark, snap, rowsPerFile = 50L)
    } catch { case t: Throwable => err = t })
    compactor.start()
    for (i <- 1 to 4)
      graft.streaming.MergeSink.applyBatch(spark, snap,
        batch(i * 100L, i * 100L + 100L), "documentKey", "lastOp", "delete")
    compactor.join()
    assert(err == null, s"compactor failed: $err")
    val keys = spark.read.parquet(snap).select("documentKey")
      .collect().map(_.getString(0)).toSet
    val expected = (0L until 500L).map(_.toString).toSet
    assert(keys === expected,
      s"rows lost in the race: missing ${(expected -- keys).take(5)}...")
    graft.operators.Artifacts.deleteRecursively(
      java.nio.file.Paths.get(snap).getParent)
  }
}
