package graft.model

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}

/** Typed core entities (postgres/schema.sql:4-31) for the paths where
  * compile-time field checks help — stateful logic, tests, user-facing
  * APIs. The dynamic-schema paths (envelope parsing, generic operators)
  * stay `DataFrame`.
  */
final case class Customer(id: Int, first_name: String, last_name: String,
                          email: String, created_at: Timestamp)

final case class Account(id: Int, customer_id: Int, account_type: String,
                         balance: Double, currency: String, created_at: Timestamp)

final case class Transaction(id: Long, account_id: Int, txn_type: String,
                             amount: Double, related_account_id: Option[Int],
                             status: String, created_at: Timestamp)

object Entities {

  /** Typed view of a parsed after-image frame (drops CDC metadata cols). */
  def customers(df: DataFrame): Dataset[Customer] = {
    val spark = df.sparkSession; import spark.implicits._
    df.select("id", "first_name", "last_name", "email", "created_at").as[Customer]
  }

  def accounts(df: DataFrame): Dataset[Account] = {
    val spark = df.sparkSession; import spark.implicits._
    df.select("id", "customer_id", "account_type", "balance", "currency",
      "created_at").as[Account]
  }

  def transactions(df: DataFrame): Dataset[Transaction] = {
    val spark = df.sparkSession; import spark.implicits._
    df.select("id", "account_id", "txn_type", "amount", "related_account_id",
      "status", "created_at").as[Transaction]
  }
}
