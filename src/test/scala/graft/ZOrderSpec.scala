package graft

import org.apache.spark.sql.functions._

import graft.operators.ZOrder

/** The z-order layout must EARN its claim from the written files' own
  * statistics: per-file min/max rectangles tight in BOTH dimensions, so
  * a predicate on either column prunes files — vs a single-column-sorted
  * layout, which prunes only its sort column.
  */
class ZOrderSpec extends SparkSpec {

  private val Files = 16

  /** Per-file (min, max) of x and y for a written layout. */
  private def fileStats(path: String): Array[(Long, Long, Long, Long)] =
    spark.read.parquet(path)
      .groupBy(input_file_name())
      .agg(min("x").as("xmin"), max("x").as("xmax"),
        min("y").as("ymin"), max("y").as("ymax"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  /** Files whose stats-rectangle intersects the query rectangle — the
    * files a stats-based reader (lakehouse format, parquet row-group
    * pruning) would have to scan.
    */
  private def scanned(stats: Array[(Long, Long, Long, Long)],
      x0: Long, x1: Long, y0: Long, y1: Long): Int =
    stats.count { case (xmin, xmax, ymin, ymax) =>
      xmax >= x0 && xmin <= x1 && ymax >= y0 && ymin <= y1
    }

  test("z-ordered files prune on BOTH dimensions; x-sorted prunes only x") {
    val dir = java.nio.file.Files.createTempDirectory("zorder_spec")
    val zPath = dir.resolve("zordered").toString
    val sPath = dir.resolve("xsorted").toString
    // two independent uniform 10-bit dimensions — the shape z-order
    // inputs are expected to have (production layouts uniformize skewed
    // columns first: bucket ids, range-bin ranks, or hash bins; a
    // concentrated raw column would waste curve resolution on empty
    // space)
    val data = spark.range(0, 100000)
      .select(pmod(xxhash64(col("id")), lit(1024L)).as("x"),
        pmod(xxhash64(col("id") * 7 + 1), lit(1024L)).as("y"))

    ZOrder.writeZOrdered(data, "x", "y", zPath, Files, bits = 10)
    data.repartitionByRange(Files, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(sPath)

    val zStats = fileStats(zPath)
    val sStats = fileStats(sPath)
    assert(zStats.length > 1 && sStats.length > 1)

    // y-only predicate (1/8 of the y range): the x-sorted layout can
    // prune nothing — every file spans ~the full y range — while the
    // z-ordered layout confines y to rectangle rows
    val zY = scanned(zStats, 0, 1023, 0, 127)
    val sY = scanned(sStats, 0, 1023, 0, 127)
    assert(sY === sStats.length,
      s"x-sorted layout unexpectedly pruned a y-predicate ($sY of ${sStats.length})")
    assert(zY < sY,
      s"z-order must beat x-sorted on a y predicate: z=$zY vs sorted=$sY")

    // 2-D rectangle (1/8 × 1/8): z-order reads a small corner
    val zXY = scanned(zStats, 0, 127, 0, 127)
    assert(zXY <= zStats.length / 2,
      s"z-order scanned $zXY of ${zStats.length} files for a 1/64-area rectangle")

    // and the x-sorted layout still wins nothing overall: its 2-D scan
    // count is bounded below by its x pruning alone
    val sXY = scanned(sStats, 0, 127, 0, 127)
    assert(zXY <= sXY,
      s"z-order 2-D scan ($zXY) must not exceed x-sorted ($sXY)")

    graft.operators.Artifacts.deleteRecursively(dir)
  }

  test("layout_zorder_eval: pruning is sound (no false negatives) and z beats linear off-axis") {
    // sf0.01, not the suite default: sf0.001's 15 users never reach the
    // x band [96, 159], which would make the x_band/xy_box soundness
    // checks vacuous (0 >= 0) — at sf0.01 every predicate has matches
    val dir = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("layout_zorder_eval")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(rows.length == 6, "2 layouts x 3 predicates")
    // exact matching counts from the raw frame — file pruning must never
    // lose a matching row, whatever the layout
    val pts = Tables.table(spark, dir, "events")
      .select((col("user_id").bitwiseAND(lit(1023L))).as("x"),
        floor(col("value")).cast("long").bitwiseAND(lit(1023L)).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val exact = Map(
      "x_band" -> pts.count(p => p._1 >= 96 && p._1 <= 159).toLong,
      "y_band" -> pts.count(p => p._2 >= 192 && p._2 <= 255).toLong,
      "xy_box" -> pts.count(p =>
        p._1 >= 96 && p._1 <= 159 && p._2 >= 192 && p._2 <= 255).toLong)
    assert(exact.values.forall(_ > 0L), s"every predicate populated: $exact")
    rows.foreach { case (layout, pred, _, _, rowsTouched) =>
      assert(rowsTouched >= exact(pred),
        s"$layout/$pred: pruning lost matches ($rowsTouched < ${exact(pred)})")
    }
    // the headline trade, both halves: the linear layout prunes its own
    // sort column but cannot prune the off-axis band; z-order prunes both
    val byKey = rows.map(r => (r._1, r._2) -> r).toMap
    assert(byKey(("linear", "x_band"))._5 < pts.length.toLong,
      "x-sorted files must prune an x band")
    assert(byKey(("linear", "y_band"))._5 == pts.length.toLong,
      "x-sorted files span all y: the y band must touch every row")
    assert(byKey(("zorder", "y_band"))._5 < pts.length.toLong,
      "z-order must prune the off-axis band")
    assert(byKey(("zorder", "xy_box"))._5 < pts.length.toLong,
      "z-order must prune the box")
  }

  test("zorder2 is a bijective interleave on the masked domain") {
    import spark.implicits._
    // every (x, y) in a small grid maps to a distinct z, and the z range
    // is exactly [0, 4^bits)
    val grid = spark.range(0, 32).select(col("id").as("x"))
      .crossJoin(spark.range(0, 32).select(col("id").as("y")))
    val zs = grid.select(ZOrder.zorder2(col("x"), col("y"), bits = 5).as("z"))
      .collect().map(_.getLong(0))
    assert(zs.length === 1024)
    assert(zs.distinct.length === 1024)
    assert(zs.min === 0L && zs.max === 1023L)
  }
}
