package graft

import org.apache.spark.sql.functions._
import graft.cdc.Envelope
import graft.model.Schemas
import graft.sources.Synthetic

class SyntheticSpec extends SparkSpec {
  import spark.implicits._

  test("generator shapes mirror the reference constraints") {
    val c = Synthetic.customers(spark, 10)
    assert(c.count() == 10)
    assert(c.select("email").distinct().count() == 10)  // UNIQUE email

    val a = Synthetic.accounts(spark, 10)
    assert(a.count() == 20)                             // 2 per customer
    assert(a.filter($"balance" < 10.0 || $"balance" >= 1000.0).count() == 0)
    assert(a.select("account_type").distinct().count() == 2)
    assert(a.groupBy("customer_id").count().filter($"count" =!= 2).count() == 0)

    val t = Synthetic.transactions(spark, 100, nAccounts = 20)
    assert(t.count() == 100)
    assert(t.filter($"amount" <= 0).count() == 0)       // CHECK amount > 0
    // transfers reference a distinct account; others have null related id
    assert(t.filter($"txn_type" === "TRANSFER" &&
      ($"related_account_id".isNull || $"related_account_id" === $"account_id")).count() == 0)
    assert(t.filter($"txn_type" =!= "TRANSFER" && $"related_account_id".isNotNull).count() == 0)
    assert(t.filter(!$"account_id".between(1, 20)).count() == 0)
  }

  test("generation is deterministic for a fixed seed") {
    def sig = Synthetic.transactions(spark, 50, 10, seed = 7)
      .agg(sum(col("amount")), sum(col("account_id"))).head().toSeq
    assert(sig == sig)
    val other = Synthetic.transactions(spark, 50, 10, seed = 8)
      .agg(sum(col("amount")), sum(col("account_id"))).head().toSeq
    assert(sig != other)
  }

  test("envelope wrapping round-trips through the CDC parser") {
    val t = Synthetic.transactions(spark, 20, nAccounts = 5)
    val env = Synthetic.asEnvelopes(t, "transactions")
    val (clean, bad) = Envelope.quarantine(
      Envelope.parse(env, "value", Schemas.transactions))
    assert(bad.count() == 0)
    assert(clean.count() == 20)
    assert(clean.filter($"op" === "c").count() == 20)
    val orig = t.agg(sum(col("amount"))).head().getDouble(0)
    val back = clean.agg(sum(col("amount"))).head().getDouble(0)
    assert(math.abs(orig - back) < 1e-6)
  }
}
