package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.cdc.ChangeEvents
import graft.functions.ExtJson.ext_json_canonical

/** Golden tests for the reference's observable serialization behavior
  * (/root/reference/main.go:113,117,123-131,138): canonical ExtJSON type
  * tags, Connect key envelope byte layout, HTML escaping, topic routing.
  */
class ExtJsonSpec extends SparkSpec {

  private def renderOne(col0: org.apache.spark.sql.Column): String =
    spark.range(1).select(col0.as("v")).head().getString(0)

  test("scalar type tags match canonical ExtJSON (main.go:117 canonical=true)") {
    assert(renderOne(ext_json_canonical(lit(42L))) === """{"$numberLong":"42"}""")
    assert(renderOne(ext_json_canonical(lit(42))) === """{"$numberInt":"42"}""")
    assert(renderOne(ext_json_canonical(lit(1.5))) === """{"$numberDouble":"1.5"}""")
    assert(renderOne(ext_json_canonical(lit(3.0))) === """{"$numberDouble":"3.0"}""")
    assert(renderOne(ext_json_canonical(lit("s"))) === "\"s\"")
    assert(renderOne(ext_json_canonical(lit(true))) === "true")
    assert(renderOne(ext_json_canonical(lit(BigDecimal("1.50")).cast("decimal(5,2)")))
      === """{"$numberDecimal":"1.50"}""")
  }

  test("double text mirrors Go formatDouble: '.0' on integral, 'G' exponents") {
    // the mongo-go-driver renders doubles with FormatFloat(f,'G',-1,64)
    // and appends ".0" to integral non-exponential forms; 'G' switches to
    // E-notation when the decimal exponent is < -4 or >= 6
    val cases = Seq(
      3.0 -> "3.0", 1.5 -> "1.5", -2.5 -> "-2.5", 0.0 -> "0.0",
      100000.0 -> "100000.0", 123456.0 -> "123456.0",
      1e6 -> "1E+06", 1e21 -> "1E+21", 1.5e7 -> "1.5E+07",
      0.0001 -> "0.0001", 1e-5 -> "1E-05", 2.5e-8 -> "2.5E-08")
    cases.foreach { case (d, want) =>
      assert(renderOne(ext_json_canonical(lit(d)))
        === s"""{"$$numberDouble":"$want"}""", s"for $d")
    }
  }

  test("U+2028/U+2029 are \\u-escaped like Go's encoding/json") {
    assert(renderOne(ext_json_canonical(lit("a\u2028b\u2029c")))
      === "\"a\\u2028b\\u2029c\"")
  }

  test("object_id convention renders as {\"$oid\":\"<24 hex>\"}") {
    import graft.functions.ExtJson.object_id
    val bytes = Array.tabulate[Byte](12)(i => (i * 17 + 3).toByte)
    val hexStr = bytes.map(b => f"${b & 0xff}%02x").mkString
    assert(renderOne(ext_json_canonical(object_id(lit(bytes))))
      === s"""{"$$oid":"$hexStr"}""")
  }

  test("bson_timestamp renders t/i as plain JSON numbers (canonical spec exception)") {
    import graft.functions.ExtJson.bson_timestamp
    assert(renderOne(ext_json_canonical(bson_timestamp(lit(1704067200L), lit(1))))
      === """{"$timestamp":{"t":1704067200,"i":1}}""")
    // nested inside a document it stays in spec form
    assert(renderOne(ext_json_canonical(struct(
        bson_timestamp(lit(7L), lit(2)).as("clusterTime"))))
      === """{"clusterTime":{"$timestamp":{"t":7,"i":2}}}""")
  }

  test("bson_regex renders the canonical $regularExpression form") {
    import graft.functions.ExtJson.bson_regex
    assert(renderOne(ext_json_canonical(bson_regex(lit("^a.*b$"), lit("i"))))
      === """{"$regularExpression":{"pattern":"^a.*b$","options":"i"}}""")
  }

  test("double specials render the canonical NaN/Infinity forms") {
    assert(renderOne(ext_json_canonical(lit(Double.NaN)))
      === """{"$numberDouble":"NaN"}""")
    assert(renderOne(ext_json_canonical(lit(Double.PositiveInfinity)))
      === """{"$numberDouble":"Infinity"}""")
    assert(renderOne(ext_json_canonical(lit(Double.NegativeInfinity)))
      === """{"$numberDouble":"-Infinity"}""")
    assert(renderOne(ext_json_canonical(lit(-0.0)))
      === """{"$numberDouble":"-0.0"}""")
  }

  test("decimal scale and precision are preserved exactly in $numberDecimal") {
    assert(renderOne(ext_json_canonical(
        lit(BigDecimal("0.0000")).cast("decimal(20,4)")))
      === """{"$numberDecimal":"0.0000"}""")
    assert(renderOne(ext_json_canonical(
        lit(BigDecimal("-12345678901234567890123456789012345678")).cast("decimal(38,0)")))
      === """{"$numberDecimal":"-12345678901234567890123456789012345678"}""")
    assert(renderOne(ext_json_canonical(
        lit(BigDecimal("0.000000000000000001")).cast("decimal(38,18)")))
      === """{"$numberDecimal":"0.000000000000000001"}""")
  }

  test("bson_decimal128 carries Decimal128 specials Spark decimals cannot hold") {
    import graft.functions.ExtJson.bson_decimal128
    for (txt <- Seq("NaN", "Infinity", "-Infinity",
        "9.999999999999999999999999999999999E+6144", "1E-6143", "-0.00")) {
      assert(renderOne(ext_json_canonical(bson_decimal128(lit(txt))))
        === s"""{"$$numberDecimal":"$txt"}""", s"for $txt")
    }
  }

  test("binary renders base64 with subtype: default 00, declared subtypes preserved") {
    import graft.functions.ExtJson.bson_binary
    val bytes = Array[Byte](1, 2, 3, 4, 5)
    val b64 = java.util.Base64.getEncoder.encodeToString(bytes)
    // a raw binary column defaults to the generic subtype
    assert(renderOne(ext_json_canonical(lit(bytes)))
      === s"""{"$$binary":{"base64":"$b64","subType":"00"}}""")
    // declared subtypes (04 = UUID, 80 = user-defined) survive
    for (st <- Seq("04", "05", "80")) {
      assert(renderOne(ext_json_canonical(bson_binary(lit(bytes), lit(st))))
        === s"""{"$$binary":{"base64":"$b64","subType":"$st"}}""", s"subtype $st")
    }
    // empty payload
    assert(renderOne(ext_json_canonical(bson_binary(lit(Array.empty[Byte]), lit("00"))))
      === """{"$binary":{"base64":"","subType":"00"}}""")
  }

  test("nested arrays of tagged scalars and binaries render recursively") {
    val c = ext_json_canonical(struct(
      array(array(lit(1L), lit(2L)), array(lit(3L))).as("m"),
      array(lit(Array[Byte](7))).as("bs")))
    val b64 = java.util.Base64.getEncoder.encodeToString(Array[Byte](7))
    assert(renderOne(c) ===
      s"""{"m":[[{"$$numberLong":"1"},{"$$numberLong":"2"}],[{"$$numberLong":"3"}]],""" +
      s""""bs":[{"$$binary":{"base64":"$b64","subType":"00"}}]}""")
  }

  test("relay value splices payloads as nested objects, absent when null (main.go:138)") {
    val mkEnv = (id: String, op: String, ct: String, dk: String,
        fd: Option[String], ud: Option[String]) =>
      spark.range(1).select(
        lit(id).as("_id"), lit(op).as("operationType"), lit(ct).as("clusterTime"),
        struct(lit("app").as("db"), lit("users").as("coll")).as("ns"),
        lit(dk).as("documentKey"),
        fd.map(lit(_)).getOrElse(lit(null).cast("string")).as("fullDocument"),
        ud.map(lit(_)).getOrElse(lit(null).cast("string")).as("updateDescription"))
    val ins = ChangeEvents.relay(mkEnv("1", "insert",
        """{"$timestamp":{"t":1704068166,"i":1}}""",
        """{"_id":{"$numberLong":"12"}}""",
        Some("""{"_id":{"$numberLong":"12"},"name":"ada"}"""), None))
      .head().getAs[String]("value")
    assert(ins ===
      """{"_id":"1","operationType":"insert","clusterTime":{"$timestamp":{"t":1704068166,"i":1}},""" +
      """"ns":{"db":"app","coll":"users"},"documentKey":{"_id":{"$numberLong":"12"}},""" +
      """"fullDocument":{"_id":{"$numberLong":"12"},"name":"ada"}}""")
    val del = ChangeEvents.relay(mkEnv("2", "delete",
        """{"$timestamp":{"t":1704068167,"i":1}}""",
        """{"_id":{"$numberLong":"13"}}""", None, None))
      .head().getAs[String]("value")
    assert(del ===
      """{"_id":"2","operationType":"delete","clusterTime":{"$timestamp":{"t":1704068167,"i":1}},""" +
      """"ns":{"db":"app","coll":"users"},"documentKey":{"_id":{"$numberLong":"13"}}}""")
    // the value must be real JSON with documentKey as a nested OBJECT
    val back = spark.range(1)
      .select(get_json_object(lit(ins), "$.documentKey._id.$numberLong").as("x"))
      .head().getString(0)
    assert(back === "12")
  }

  test("date/timestamp render as $date with epoch millis") {
    val ts = lit("2024-01-01 00:00:00").cast("timestamp")
    assert(renderOne(ext_json_canonical(ts))
      === """{"$date":{"$numberLong":"1704067200000"}}""")
  }

  test("nested struct/array render with field order preserved") {
    val c = ext_json_canonical(struct(
      lit(7L).as("_id"),
      array(lit(1), lit(2)).as("xs"),
      struct(lit("x").as("k")).as("sub")))
    assert(renderOne(c) ===
      """{"_id":{"$numberLong":"7"},"xs":[{"$numberInt":"1"},{"$numberInt":"2"}],"sub":{"k":"x"}}""")
  }

  test("HTML escaping matches Go escapeHTML=true (main.go:117 second true)") {
    assert(renderOne(ext_json_canonical(lit("a<b>&c")))
      === "\"a\\u003cb\\u003e\\u0026c\"")
  }

  test("connect key envelope bytes match main.go:123-131 layout") {
    val got = spark.range(1)
      .select(ChangeEvents.connectKeyEnvelope(lit("{\"_id\":1}")).as("k"))
      .head().getString(0)
    assert(got === """{"schema":{"type":"string","optional":false},"payload":"{\"_id\":1}"}""")
  }

  test("topic routing = db ++ '.' ++ coll for arbitrary names (main.go:113)") {
    val name = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val prop = Prop.forAll(name, name) { (db: String, coll: String) =>
      val got = spark.range(1)
        .select(ChangeEvents.topicColumn(lit(db), lit(coll)).as("t"))
        .head().getString(0)
      got == s"$db.$coll"
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("string escaping round-trips through a real JSON parser for arbitrary strings") {
    import org.apache.spark.sql.functions.{col, from_json, struct}
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val strGen = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('"', '\\', '\n', '\t', '<', '>', '&', '€', '中'),
      Gen.choose(' ', '~'))).map(_.mkString)
    val schema = StructType(Seq(StructField("s", StringType)))
    val prop = Prop.forAll(strGen) { (s: String) =>
      val rendered = spark.range(1)
        .select(ext_json_canonical(struct(lit(s).as("s"))).as("j"))
        .select(from_json(col("j"), schema).getField("s").as("back"))
        .head().getString(0)
      rendered == s
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("op filter is total: no input crashes, complement goes to dead letter (§2.2)") {
    import spark.implicits._
    val ops = Seq("insert", "update", "replace", "delete", "invalidate",
      "drop", "dropDatabase", "rename", null).toDF("operationType")
    val kept = ChangeEvents.opFilter(ops).collect().map(_.getString(0)).toSet
    val dead = ChangeEvents.deadLetter(ops).collect().map(r => Option(r.getString(0))).toSet
    assert(kept === Set("insert", "update", "replace", "delete"))
    assert(dead === Set(Some("invalidate"), Some("drop"), Some("dropDatabase"),
      Some("rename"), None))
    assert(kept.size + dead.size === 9)
  }
}
