package graft

import org.apache.spark.sql.functions._
import graft.cdc.Envelope
import graft.model.Schemas

/** Debezium envelope parse, quarantine routing, delete semantics
  * (FIXTURES.md §A.2).
  */
class EnvelopeSpec extends SparkSpec {
  import spark.implicits._

  private val good =
    """{"payload":{"before":null,"after":{"id":7,"account_id":3,"txn_type":"TRANSFER","amount":412.55,"related_account_id":9,"status":"COMPLETED","created_at":"2026-08-12T09:15:02.123456Z"},"source":{"table":"transactions","lsn":12345,"ts_ms":1765530902123},"op":"c","ts_ms":1765530902500}}"""
  private val delete =
    """{"payload":{"before":{"id":8,"account_id":3,"txn_type":"DEPOSIT","amount":1.0,"related_account_id":null,"status":"COMPLETED","created_at":"2026-08-12T09:15:02Z"},"after":null,"source":{"table":"transactions","lsn":12346,"ts_ms":1765530903000},"op":"d","ts_ms":1765530903500}}"""
  private val malformed = """{"payload": {"after": {"id": 9,"""

  test("parse extracts after-image fields, op, ts_ms; malformed rows quarantine") {
    val raw = Seq(good, delete, malformed).toDF("value")
    val parsed = Envelope.parse(raw, "value", Schemas.transactions)
    val (clean, bad) = Envelope.quarantine(parsed)
    assert(bad.count() == 1)
    val rows = clean.collect()
    assert(rows.length == 2)
    val c = rows.find(_.getAs[String]("op") == "c").get
    assert(c.getAs[Long]("id") == 7L)
    assert(c.getAs[Double]("amount") == 412.55)
    assert(c.getAs[Long]("ts_ms") == 1765530902500L)
    // delete (after=null) falls back to the before-image: the key and row
    // image survive for downstream tombstone merges
    val del = rows.find(_.getAs[String]("op") == "d").get
    assert(del.getAs[Long]("id") == 8L)
    assert(del.getAs[String]("txn_type") == "DEPOSIT")
  }

  test("afterImages drops deletes by default, keeps them on request") {
    val raw = Seq(good, delete).toDF("value")
    val parsed = Envelope.parse(raw, "value", Schemas.transactions)
    val (clean, _) = Envelope.quarantine(parsed)
    assert(Envelope.afterImages(clean, "id").count() == 1)
    assert(Envelope.afterImages(clean, "id", keepDeletes = true).count() == 2)
  }

  test("typed entity facade round-trips parsed after-images") {
    val raw = Seq(good).toDF("value")
    val (clean, _) = Envelope.quarantine(Envelope.parse(raw, "value", Schemas.transactions))
    val txns = graft.model.Entities.transactions(Envelope.afterImages(clean, "id"))
    val t = txns.collect().head
    assert(t.id == 7L && t.amount == 412.55 && t.related_account_id.contains(9))
    // typed aggregation compiles against fields
    assert(txns.filter(_.txn_type == "TRANSFER").count() == 1)
  }

  test("jsonField extracts typed values from a JSON string column") {
    val df = Seq("""{"k": 42, "name": "x"}""").toDF("props")
    val row = df.select(
      Envelope.jsonField($"props", "k", "int").as("k"),
      Envelope.jsonField($"props", "name", "string").as("name"),
      Envelope.jsonField($"props", "missing", "int").as("m")).head()
    assert(row.getAs[Int]("k") == 42)
    assert(row.getAs[String]("name") == "x")
    assert(row.isNullAt(2))
  }
}
