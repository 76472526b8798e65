package graft.streaming

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.QualityModel

/** Online maintenance of the quality classifier: the NB sufficient
  * statistics ([[QualityModel.fit]]'s per-bucket class counts) kept up
  * to date by a streaming aggregation while documents ingest — train as
  * you crawl, instead of a separate batch fit over the accumulated
  * corpus.
  *
  * Why this is exactly as cheap as the batch fit, per batch: the
  * statistics are EXACT LONG COUNTS, so the streaming aggregation's
  * state is the sufficient statistics — `d+1` rows of two longs each
  * (one per hash bucket plus the doc-count row), regardless of how many
  * documents have streamed through. Each micro-batch folds its token
  * counts into that state with ordinary partial aggregation (map-side
  * combine reduces a batch to ≤ d rows per partition before the
  * shuffle), and complete-mode output re-emits the ≤ d+1-row snapshot —
  * reading the CURRENT model is a d-row scan of the sink, no corpus
  * rescan. Long addition is associative and commutative, so the
  * maintained counts are bit-equal to a batch recount however the
  * stream was micro-batched or partitioned — which makes the derived
  * model bit-equal to `QualityModel.fit` on the same rows
  * (StreamingTrainSpec pins both, mid-stream and at end).
  *
  * Same-statistics trade: NB stays exactly refreshable because its fit
  * is one aggregation; the LR refinement ([[QualityModel.refine]]) is
  * iterative over a FIXED snapshot and would re-run from the maintained
  * NB weights on a cadence — statistics stream, refinements batch.
  */
object OnlineTrainer {

  /** Doc-count rows ride under this pseudo-bucket (real buckets are
    * `[0, d)`), so ONE streaming aggregation maintains both the
    * per-bucket token counts and the class priors.
    */
  val DocBucket: Long = -1L

  /** The sufficient-statistics stream: `(b, cp, cn)` per feature bucket
    * plus the [[DocBucket]] row counting labeled docs. Run with
    * `outputMode("complete")` — the group count is ≤ d+1, so the
    * snapshot re-emission is model-sized, never corpus-sized.
    */
  def stats(docs: DataFrame, toksCol: String, labelCol: String,
      d: Int = 128): DataFrame = {
    val tokRows = docs
      .select(col(labelCol).as("label"), explode(col(toksCol)).as("tok"))
      .select(col("label"), QualityModel.bucketOf(col("tok"), d).as("b"))
    val docRows = docs.select(col(labelCol).as("label"),
      lit(DocBucket).as("b"))
    tokRows.unionByName(docRows)
      .groupBy("b")
      .agg(
        sum(when(col("label"), 1L).otherwise(0L)).as("cp"),
        sum(when(col("label"), 0L).otherwise(1L)).as("cn"))
  }

  /** Spark's `round(x, 0)` on a double: HALF_UP over the decimal string
    * rendering (`BigDecimal.valueOf`), NOT over the binary expansion —
    * matching it digit-for-digit keeps the streamed weights bit-equal
    * to the batch fit's.
    */
  private def sparkRound(x: Double): Long =
    JBigDecimal.valueOf(x).setScale(0, RoundingMode.HALF_UP).longValue

  /** Closed-form model from a statistics snapshot — the driver-side
    * replica of [[QualityModel.fit]]'s weight formula (same two-divide-
    * then-multiply sequence, same rounding), evaluated over the ≤ d+1
    * maintained rows instead of a corpus pass.
    */
  def modelFrom(snapshot: Seq[(Long, Long, Long)], d: Int = 128)
      : QualityModel.Model = {
    val byB = snapshot.map { case (b, cp, cn) => b -> (cp, cn) }.toMap
    val (tp, tn) = snapshot.filter(_._1 >= 0)
      .foldLeft((0L, 0L)) { case ((p, n), (_, cp, cn)) => (p + cp, n + cn) }
    val w = Array.tabulate(d) { b =>
      val (cp, cn) = byB.getOrElse(b.toLong, (0L, 0L))
      sparkRound(math.log(
        ((cp + 1).toDouble / (tp + d)) * ((tn + d).toDouble / (cn + 1))) * 1e6)
    }
    val (np, nn) = byB.getOrElse(DocBucket, (0L, 0L))
    require(np > 0 && nn > 0,
      s"model needs both classes observed (np=$np, nn=$nn)")
    // the batch fit quantizes the prior with math.round — mirror it
    QualityModel.Model(w, math.round(math.log(np.toDouble / nn) * 1e6))
  }
}
