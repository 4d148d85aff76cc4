package graft

import org.apache.spark.sql.functions._
import graft.silver.Masking

/** Pseudonymization and masking semantics: determinism, salt
  * separation, null discipline, referential integrity, and the
  * full-mask edge of short values.
  */
class MaskingSpec extends SparkSpec {
  import spark.implicits._

  test("pseudonym: deterministic, salt-separated, null-preserving") {
    val df = Seq(Some(1L), Some(2L), Some(1L), None).toDF("k")
    val a = df.select(Masking.pseudonym($"k", "s1").as("t")).collect().map(_.getString(0))
    val b = df.select(Masking.pseudonym($"k", "s1").as("t")).collect().map(_.getString(0))
    assert(a.toSeq == b.toSeq, "same salt must be deterministic")
    assert(a(0) == a(2) && a(0) != a(1), "equal keys same token, distinct keys distinct")
    assert(a(3) == null, "null keys stay null")
    assert(a(0).length == 16 && a(0).matches("[0-9a-f]{16}"))
    val c = df.select(Masking.pseudonym($"k", "s2").as("t")).collect().map(_.getString(0))
    assert(a(0) != c(0), "different salts must be unlinkable")
  }

  test("pseudonymize preserves referential integrity across tables") {
    val dim = Seq((1L, "GOLD"), (2L, "SILVER")).toDF("id", "tier")
    val fact = Seq((1L, 10.0), (1L, 20.0), (2L, 5.0)).toDF("id", "amt")
    val joined = Masking.pseudonymize(fact, Seq("id"), "s")
      .join(Masking.pseudonymize(dim, Seq("id"), "s"), "id")
      .groupBy($"tier").agg(sum($"amt").as("total"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(joined == Map("GOLD" -> 30.0, "SILVER" -> 5.0),
      "token join must reproduce the clear-key join")
  }

  test("maskTail keeps only the tail; short values mask fully; null stays null") {
    val df = Seq(Some("123456789012345"), Some("1234"), Some("12"), None)
      .toDF("acct")
    val m = df.select(Masking.maskTail($"acct", 4).as("m"))
      .collect().map(_.getString(0))
    assert(m(0) == "***********2345")
    assert(m(1) == "****", "value of exactly keep length must fully mask")
    assert(m(2) == "**")
    assert(m(3) == null)
  }

  test("non-string keys tokenize through their canonical string form") {
    val df = Seq(42L).toDF("k")
    val t = df.select(Masking.pseudonym($"k", "s").as("t")).head().getString(0)
    val expected = df.select(substring(
      sha2(concat_ws(":", lit("s"), lit("42")), 256), 1, 16).as("e"))
      .head().getString(0)
    assert(t == expected)
  }
}
