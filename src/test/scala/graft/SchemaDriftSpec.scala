package graft

import org.apache.spark.sql.functions._

import graft.cdc.ChangeEvents

/** Schema drift on the CDC path: the envelope is the WIRE CONTRACT
  * (fixed fields), but everything inside the dynamic payloads is
  * schema-on-read — a producer adding fields to its documents must
  * flow through the relay byte-for-byte without redeploying it, and
  * unknown top-level envelope fields must be ignored, not dead-lettered.
  */
class SchemaDriftSpec extends SparkSpec {

  private def envelopes(lines: String*) = {
    import spark.implicits._
    ChangeEvents.parseEnvelope(lines.toDF("value"))
  }

  test("new fields inside fullDocument relay byte-for-byte (raw splice)") {
    // a document with fields the engine has never seen, nested objects
    // included — exactly what a producer-side schema change looks like
    val doc = """{"a":{"$numberLong":"1"},"brand_new":{"nested":{"deep":"v"},"arr":[1,2,3]},"emoji":"✓"}"""
    val ev = s"""{"_id":"1","operationType":"insert","clusterTime":"2024-01-01T00:00:00Z",""" +
      s""""ns":{"db":"app","coll":"c"},"documentKey":"{\\"_id\\":1}","fullDocument":"${doc.replace("\"", "\\\"")}"}"""
    val value = envelopes(ev)
      .select(ChangeEvents.eventValue().as("value"))
      .head().getString(0)
    // the unknown payload content must appear VERBATIM in the Kafka
    // value — no re-escape, no field loss, no reordering
    assert(value.contains(s""""fullDocument":$doc"""), value)
  }

  test("unknown top-level envelope fields are ignored, not dead-lettered") {
    val ev = s"""{"_id":"2","operationType":"update","clusterTime":"2024-01-01T00:00:00Z",""" +
      s""""ns":{"db":"app","coll":"c"},"documentKey":"{\\"_id\\":2}","fullDocument":"{}",""" +
      s""""wallTime":"2024-01-01","lsid":{"id":"x"},"txnNumber":7}"""
    val parsed = envelopes(ev)
    // parses as a document op (not a decode failure)
    assert(parsed.filter(col("operationType") === "update").count() === 1)
    assert(ChangeEvents.deadLetter(parsed).count() === 0)
  }
}
