package org.apache.spark.sql.graftglue

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made the Expression↔Column bridge `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`). This package object
  * lives under `org.apache.spark.sql` solely to re-export the two
  * conversions our custom Catalyst expressions need; no other Spark
  * internals are touched.
  */
object glue {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Deep conversion: a fully-catalyst expression tree (UnresolvedFunction
    * et al.), not the lazy `ColumnNodeExpression` wrapper [[toExpression]]
    * returns. A FunctionRegistry builder must return THIS form — the
    * analyzer resolves ordinary unresolved nodes during analysis, but a
    * ColumnNodeExpression substituted into a plan by function resolution
    * arrives after the conversion rule has run and survives, unresolved,
    * into codegen ("Cannot generate code for ... columnnodeexpression").
    */
  def toCatalystExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** A FRESH session over an existing SparkContext with the given
    * extensions applied — what `.withExtensions(...).getOrCreate()`
    * does for a brand-new context, testable in a JVM whose shared
    * context (and default session) already exists: `getOrCreate`
    * returns the default session and silently DROPS the extensions, so
    * the injection path could otherwise never be exercised under the
    * shared-session test harness.
    */
  def sessionWithExtensions(
      sc: org.apache.spark.SparkContext,
      configure: org.apache.spark.sql.SparkSessionExtensions => Unit)
      : org.apache.spark.sql.SparkSession = {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    configure(ext)
    // the full constructor is Scala-private (builder-only) but
    // bytecode-public — plain reflection, no setAccessible
    val ctor = classOf[org.apache.spark.sql.classic.SparkSession]
      .getConstructor(
        classOf[org.apache.spark.SparkContext],
        classOf[Option[_]], classOf[Option[_]],
        classOf[org.apache.spark.sql.SparkSessionExtensions],
        classOf[scala.collection.immutable.Map[_, _]],
        classOf[scala.collection.immutable.Map[_, _]])
    ctor.newInstance(sc, None, None, ext,
      Map.empty[String, String], Map.empty[String, String])
  }
}
