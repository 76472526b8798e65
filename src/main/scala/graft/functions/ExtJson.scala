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
        // Go's encoding/json always escapes the JS line separators
        case '\u2028' => sb.append("\\u2028")
        case '\u2029' => sb.append("\\u2029")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append('"')
  }

  /** Double text matching the Go mongo-driver's canonical-ExtJSON
    * `formatDouble`: shortest round-trip digits rendered with
    * `strconv.FormatFloat(f, 'G', -1, 64)` semantics — exponential form
    * (`dE±XX`, upper-case E, signed two-digit-minimum exponent) when the
    * decimal exponent is < -4 or ≥ 6, plain decimal otherwise — and a
    * `.0` appended to integral plain forms (3.0 → "3.0", 1e21 →
    * "1E+21", 1e-5 → "1E-05"). The shortest digits come from Java's
    * `Double.toString`; on rare pre-JDK-19 inputs Java emits one digit
    * more than Go's shortest — same value, one extra digit.
    */
  private[functions] def doubleText(d: Double): String = {
    if (d.isNaN) "NaN"
    else if (d.isPosInfinity) "Infinity"
    else if (d.isNegInfinity) "-Infinity"
    else if (d == 0.0) { if (1.0 / d < 0) "-0.0" else "0.0" }
    else {
      val neg = d < 0
      val s = java.lang.Double.toString(math.abs(d)) // "ddd.ddd" or "d.dddE±x"
      // normalize to (digits without leading/trailing zeros, decimal point
      // position dp): value = 0.<digits> × 10^dp
      val (digits, dp) = {
        val eIdx = s.indexOf('E')
        val mant = if (eIdx < 0) s else s.substring(0, eIdx)
        val e = if (eIdx < 0) 0 else s.substring(eIdx + 1).toInt
        val dot = mant.indexOf('.')
        val raw = mant.substring(0, dot) + mant.substring(dot + 1)
        val lead = raw.indexWhere(_ != '0')
        val trimmed = raw.substring(lead).reverse.dropWhile(_ == '0').reverse
        (trimmed, dot - lead + e)
      }
      val exp = dp - 1
      val sb = new java.lang.StringBuilder(24)
      if (neg) sb.append('-')
      if (exp < -4 || exp >= 6) {
        sb.append(digits.charAt(0))
        if (digits.length > 1) sb.append('.').append(digits, 1, digits.length)
        sb.append('E').append(if (exp < 0) '-' else '+')
        val ae = math.abs(exp)
        if (ae < 10) sb.append('0')
        sb.append(ae)
      } else if (dp <= 0) {
        sb.append("0.")
        var i = dp; while (i < 0) { sb.append('0'); i += 1 }
        sb.append(digits)
      } else if (dp >= digits.length) {
        sb.append(digits)
        var i = digits.length; while (i < dp) { sb.append('0'); i += 1 }
        sb.append(".0")
      } else {
        sb.append(digits, 0, dp).append('.').append(digits, dp, digits.length)
      }
      sb.toString
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
      // BSON Timestamp carries its t/i as PLAIN JSON numbers in canonical
      // ExtJSON (the one spec'd exception to scalar tagging) — a struct
      // following the {"$timestamp":{t,i}} convention renders that way
      case st: StructType
          if st.length == 1 && st(0).name == "$timestamp" &&
            (st(0).dataType match {
              case inner: StructType =>
                inner.length == 2 && inner(0).name == "t" && inner(1).name == "i" &&
                  inner.forall(f => f.dataType == LongType || f.dataType == IntegerType)
              case _ => false
            }) && !v.asInstanceOf[InternalRow].isNullAt(0) =>
        val inner = st(0).dataType.asInstanceOf[StructType]
        val ts = v.asInstanceOf[InternalRow].getStruct(0, 2)
        sb.append("{\"$timestamp\":{\"t\":")
          .append(String.valueOf(ts.get(0, inner(0).dataType)))
          .append(",\"i\":")
          .append(String.valueOf(ts.get(1, inner(1).dataType)))
          .append("}}")
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
  import org.apache.spark.sql.functions.{coalesce, get_json_object, lower, hex, struct}

  /** Render any column as canonical Extended JSON (main.go:117,138). */
  def ext_json_canonical(c: Column): Column =
    glue.toColumn(ExtJsonCanonical(glue.toExpression(c)))

  /** ObjectId convention: wrap a 12-byte `binary` column (or any binary
    * holding a Mongo ObjectId) so [[ext_json_canonical]] renders it as
    * the BSON `{"$oid":"<24-hex>"}` form instead of generic `$binary` —
    * a struct whose single field is literally named `$oid` carrying the
    * lower-case hex, which is exactly the canonical shape the reference's
    * MarshalExtJSON emits for `primitive.ObjectID` (main.go:117).
    * Compose inside structs: `struct(object_id(col("id")).as("_id"), …)`.
    */
  def object_id(binaryCol: Column): Column =
    struct(lower(hex(binaryCol)).as("$oid"))

  /** BSON Timestamp convention (the type a change stream's `clusterTime`
    * really is): renders as `{"$timestamp":{"t":<seconds>,"i":<ordinal>}}`
    * with t/i as PLAIN JSON numbers — the canonical-spec form, which the
    * renderer special-cases (a generic struct would tag the longs as
    * `$numberLong`).
    */
  def bson_timestamp(seconds: Column, ordinal: Column): Column =
    struct(struct(seconds.cast("long").as("t"),
      ordinal.cast("long").as("i")).as("$timestamp"))

  /** BSON regular-expression convention: renders as
    * `{"$regularExpression":{"pattern":"…","options":"…"}}` (canonical
    * spec form the Go driver emits for `primitive.Regex`).
    */
  def bson_regex(pattern: Column, options: Column): Column =
    struct(struct(pattern.as("pattern"), options.as("options"))
      .as("$regularExpression"))

  /** Full-fidelity Decimal128 convention: carries the canonical
    * significand/exponent TEXT (`"NaN"`, `"Infinity"`, `"-Infinity"`,
    * `"1E-6143"`, …) so the values Spark's `DecimalType` cannot represent
    * — IEEE 754-2008 decimal128 specials and the full ±6144 exponent
    * range the Go driver's `primitive.Decimal128` round-trips
    * (main.go:117) — still render as `{"$numberDecimal":"…"}`. A Spark
    * decimal column renders its plain string; for in-range values prefer
    * the typed column (ext_json_canonical tags it identically).
    */
  def bson_decimal128(text: Column): Column =
    struct(text.cast("string").as("$numberDecimal"))

  /** BSON Binary with an explicit subtype: renders as
    * `{"$binary":{"base64":"…","subType":"xx"}}`. `ext_json_canonical`
    * on a raw `binary` column defaults to subtype "00" (generic); this
    * convention carries the declared subtype — "04" UUID, "05" MD5,
    * "80"+ user-defined — which the canonical spec preserves.
    */
  def bson_binary(bytes: Column, subType: Column): Column =
    struct(struct(org.apache.spark.sql.functions.base64(bytes).as("base64"),
      subType.as("subType")).as("$binary"))

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
