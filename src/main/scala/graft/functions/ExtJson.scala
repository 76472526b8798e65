package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.graftglue.glue
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Canonical MongoDB Extended JSON rendering — the reference's de-facto type
  * system (`bson.MarshalExtJSON(v, canonical=true, escapeHTML=true)`,
  * /root/reference/main.go:117,138): scalars carry type tags so type fidelity
  * survives the JSON-string hop:
  *
  *   Long   → {"$numberLong":"42"}      Int    → {"$numberInt":"42"}
  *   Double → {"$numberDouble":"1.5"}   Decimal→ {"$numberDecimal":"1.50"}
  *   Date   → {"$date":{"$numberLong":"<epoch ms>"}}
  *   String → "s"   Boolean → true/false   Null → null
  *   Binary → {"$binary":{"base64":"…","subType":"00"}}
  *   Struct → {…}   Array → […]   Map → {…}
  *
  * Spark's `to_json` cannot produce these wrappers, hence a native Catalyst
  * expression (not a Scala UDF: no SerDe of the input row to JVM objects —
  * we walk the InternalRow/UnsafeRow directly; CodegenFallback keeps the
  * surrounding projection in whole-stage codegen with a single virtual call
  * per row).
  */
case class ExtJsonCanonical(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "ext_json_canonical"

  override protected def withNewChildInternal(newChild: Expression): ExtJsonCanonical =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString {
      val sb = new java.lang.StringBuilder(64)
      ExtJsonCanonical.render(sb, input, child.dataType)
      sb.toString
    }
}

object ExtJsonCanonical {

  /** JSON string escape matching Go's encoding/json with escapeHTML=true
    * (main.go:117's second `true`): `<`, `>`, `&` are \u-escaped too.
    */
  private def escape(sb: java.lang.StringBuilder, s: String): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '<'  => sb.append("\\u003c")
        case '>'  => sb.append("\\u003e")
        case '&'  => sb.append("\\u0026")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append('"')
  }

  /** Shortest-round-trip double text, matching Go's strconv (and the BSON
    * canonical spec) for the common cases; whole doubles render without
    * the trailing ".0" Java adds.
    */
  private def doubleText(d: Double): String = {
    if (d.isNaN) "NaN"
    else if (d.isPosInfinity) "Infinity"
    else if (d.isNegInfinity) "-Infinity"
    else {
      val s = java.lang.Double.toString(d)
      if (s.endsWith(".0")) s.substring(0, s.length - 2) else s
    }
  }

  def render(sb: java.lang.StringBuilder, v: Any, dt: DataType): Unit = {
    if (v == null) { sb.append("null"); return }
    dt match {
      case StringType => escape(sb, v.asInstanceOf[UTF8String].toString)
      case BooleanType => sb.append(v.toString)
      case ByteType | ShortType | IntegerType =>
        sb.append("{\"$numberInt\":\"").append(v.toString).append("\"}")
      case LongType =>
        sb.append("{\"$numberLong\":\"").append(v.toString).append("\"}")
      case FloatType | DoubleType =>
        val d = v match {
          case f: java.lang.Float => f.toDouble
          case d: java.lang.Double => d.doubleValue()
        }
        sb.append("{\"$numberDouble\":\"").append(doubleText(d)).append("\"}")
      case _: DecimalType =>
        sb.append("{\"$numberDecimal\":\"")
          .append(v.asInstanceOf[Decimal].toBigDecimal.bigDecimal.toPlainString)
          .append("\"}")
      case TimestampType | TimestampNTZType =>
        // stored micros → BSON $date is epoch millis; floorDiv, not /, so
        // pre-1970 sub-millisecond values floor like Go's time.UnixMilli
        val ms = Math.floorDiv(v.asInstanceOf[Long], 1000L)
        sb.append("{\"$date\":{\"$numberLong\":\"").append(ms).append("\"}}")
      case DateType =>
        val ms = v.asInstanceOf[Int].toLong * 86400000L
        sb.append("{\"$date\":{\"$numberLong\":\"").append(ms).append("\"}}")
      case BinaryType =>
        val b64 = java.util.Base64.getEncoder.encodeToString(v.asInstanceOf[Array[Byte]])
        sb.append("{\"$binary\":{\"base64\":\"").append(b64).append("\",\"subType\":\"00\"}}")
      case st: StructType =>
        val row = v.asInstanceOf[InternalRow]
        sb.append('{')
        var i = 0
        while (i < st.length) {
          if (i > 0) sb.append(',')
          escape(sb, st(i).name)
          sb.append(':')
          render(sb, if (row.isNullAt(i)) null else row.get(i, st(i).dataType), st(i).dataType)
          i += 1
        }
        sb.append('}')
      case at: ArrayType =>
        val arr = v.asInstanceOf[ArrayData]
        sb.append('[')
        var i = 0
        while (i < arr.numElements()) {
          if (i > 0) sb.append(',')
          render(sb, if (arr.isNullAt(i)) null else arr.get(i, at.elementType), at.elementType)
          i += 1
        }
        sb.append(']')
      case mt: MapType =>
        val m = v.asInstanceOf[MapData]
        val keys = m.keyArray(); val vals = m.valueArray()
        sb.append('{')
        var i = 0
        while (i < m.numElements()) {
          if (i > 0) sb.append(',')
          val k = keys.get(i, mt.keyType)
          escape(sb, String.valueOf(k))
          sb.append(':')
          render(sb, if (vals.isNullAt(i)) null else vals.get(i, mt.valueType), mt.valueType)
          i += 1
        }
        sb.append('}')
      case other =>
        escape(sb, String.valueOf(v))
    }
  }
}

/** Column-level entry points for the ExtJSON family. */
object ExtJson {
  import org.apache.spark.sql.functions.{coalesce, get_json_object}

  /** Render any column as canonical Extended JSON (main.go:117,138). */
  def ext_json_canonical(c: Column): Column =
    glue.toColumn(ExtJsonCanonical(glue.toExpression(c)))

  /** Read a value back out of canonical ExtJSON, unwrapping the scalar
    * type tags (`{"$numberLong":"42"}` → `"42"`, `$date` → epoch millis,
    * plain strings pass through). `path` is a JSON path like `$._id`.
    */
  def ext_json_get(c: Column, path: String): Column =
    coalesce(
      get_json_object(c, s"$path['$$numberLong']"),
      get_json_object(c, s"$path['$$numberInt']"),
      get_json_object(c, s"$path['$$numberDouble']"),
      get_json_object(c, s"$path['$$numberDecimal']"),
      get_json_object(c, s"$path['$$date']['$$numberLong']"),
      get_json_object(c, path))
}
