package graft

import org.apache.spark.sql.functions._
import graft.silver.CryptoShred

/** Crypto-shredding: round-trip fidelity, O(1) shred semantics, and the
  * null disciplines (unknown subject, null subject, null payload).
  */
class CryptoShredSpec extends SparkSpec {
  import spark.implicits._

  private def data() = Seq(
    (1L, Some(10L), Some("acct-111")),
    (2L, Some(20L), Some("acct-222")),
    (3L, Some(10L), Some("acct-333")),
    (4L, Option.empty[Long], Some("acct-444")),   // null subject
    (5L, Some(20L), Option.empty[String])         // null payload
  ).toDF("row_id", "user_id", "acct")

  test("encrypt/decrypt round-trips; ciphertext differs from plaintext") {
    val df = data()
    val keys = CryptoShred.subjectKeys(df, "user_id", "secret")
    val enc = CryptoShred.encryptColumns(df, "user_id", keys, Seq("acct"))
    val encRows = enc.orderBy($"row_id").collect()
    assert(!encRows.take(3).exists(r => Option(r.getString(2))
      .exists(_.contains("acct"))), "plaintext leaked into ciphertext")
    val dec = CryptoShred.decryptColumns(enc, "user_id", keys, Seq("acct"))
      .orderBy($"row_id").collect().map(r => Option(r.getString(2)))
    assert(dec.toSeq == Seq(Some("acct-111"), Some("acct-222"),
      Some("acct-333"), None, None))
  }

  test("shredding a subject's key makes ONLY their rows unreadable") {
    val df = data()
    val keys = CryptoShred.subjectKeys(df, "user_id", "secret")
    val enc = CryptoShred.encryptColumns(df, "user_id", keys, Seq("acct"))
    val kept = CryptoShred.shred(keys, "user_id", Seq(10L).toDF("user_id"))
    assert(kept.count() == 1, "shred must remove exactly the subject's key row")
    val dec = CryptoShred.decryptColumns(enc, "user_id", kept, Seq("acct"))
      .orderBy($"row_id").collect().map(r => Option(r.getString(2)))
    assert(dec.toSeq == Seq(None, Some("acct-222"), None, None, None),
      s"got ${dec.toSeq}")
  }

  test("null-subject rows never land readable plaintext after encrypt") {
    val df = data()
    val keys = CryptoShred.subjectKeys(df, "user_id", "secret")
    val enc = CryptoShred.encryptColumns(df, "user_id", keys, Seq("acct"))
    assert(enc.filter($"row_id" === 4L).head().get(2) == null,
      "unkeyed subject's payload must not survive in the clear")
  }

  test("key derivation is deterministic per secret and distinct per subject") {
    val df = data()
    val k1 = CryptoShred.subjectKeys(df, "user_id", "s1").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val k2 = CryptoShred.subjectKeys(df, "user_id", "s1").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val k3 = CryptoShred.subjectKeys(df, "user_id", "s2").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(k1 == k2 && k1(10L) != k1(20L) && k1(10L) != k3(10L))
    assert(k1.values.forall(_.length == 32))
  }
}
