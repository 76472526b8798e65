package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-file compaction — the operational complement of every
  * streaming parquet sink in this engine (the relay's per-topic sink
  * and [[graft.streaming.MergeSink]] both emit one file batch per
  * epoch): periodically rewrite a directory of many small files into
  * few right-sized ones, so the 100 TB table a year of micro-batches
  * builds doesn't degrade every later scan with per-file open/footer
  * costs and a metadata-bound driver.
  *
  * The rewrite is one narrow job: read → `repartition(ceil(rows /
  * rowsPerFile))` → write to a temp sibling → atomic swap (same
  * publish discipline as [[Artifacts]]). A round-robin repartition is
  * deliberate: compaction must not assume any key, and the exchange it
  * pays is the point of the operation (it is run off the hot path, at a
  * cadence chosen so its cost amortizes over the scans it speeds up).
  * Callers that DO have a layout key should compact through
  * [[ZOrder.writeZOrdered]] or [[Bucketing.writeBucketed]] instead and
  * get clustering for the same rewrite.
  */
object Compaction {

  /** Rewrite the parquet directory at `path` into files of ~
    * `rowsPerFile` rows. Returns (filesBefore, filesAfter).
    */
  def compact(spark: SparkSession, path: String, rowsPerFile: Long)
      : (Int, Int) = {
    val dir = java.nio.file.Paths.get(path)
    def parquetFiles(p: java.nio.file.Path): Int = {
      val s = java.nio.file.Files.list(p)
      try {
        var n = 0
        val it = s.iterator()
        while (it.hasNext) {
          if (it.next().getFileName.toString.endsWith(".parquet")) n += 1
        }
        n
      } finally s.close()
    }
    val before = parquetFiles(dir)
    val df = spark.read.parquet(path)
    val rows = df.count()
    val target = math.max(1, math.ceil(rows.toDouble / rowsPerFile).toInt)
    val next = java.nio.file.Paths.get(path + ".compact")
    df.repartition(target).write.mode("overwrite").parquet(next.toString)
    Artifacts.deleteRecursively(dir)
    java.nio.file.Files.move(next, dir,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    (before, parquetFiles(dir))
  }
}
