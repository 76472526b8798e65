package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, DotProduct, ExtJsonCanonical}

/** SQL-surface registration of the engine's native expressions, so
  * `spark.sql("SELECT ext_json_canonical(...), cosine_similarity(...)")`
  * works like any built-in.
  *
  * Two entry points:
  *  - [[GraftExtensions]] for new sessions:
  *    `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  *    `builder.withExtensions(new GraftExtensions)` — the injection path a
  *    cluster deploys (spark-defaults.conf), no code changes per job.
  *  - [[GraftFunctions.registerAll]] for an already-running session
  *    (temp-function registry).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftFunctions {

  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("ext_json_canonical",
      new ExpressionInfo(classOf[ExtJsonCanonical].getName, "ext_json_canonical"),
      (exprs: Seq[Expression]) => ExtJsonCanonical(exprs.head)),
    ("cosine_similarity",
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))),
    ("dot_product",
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))

  /** Register on a live session (temp functions, session-scoped). */
  def registerAll(spark: SparkSession): Unit =
    all.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
