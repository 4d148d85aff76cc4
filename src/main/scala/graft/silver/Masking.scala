package graft.silver

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII pseudonymization and masking for analyst-facing marts — the
  * de-identification layer between the reference's raw banking CDC
  * (customers/accounts with names, emails, phone numbers,
  * readme.md:33-41) and its Snowflake analyst tier, where GDPR
  * "pseudonymisation" (Art. 4(5)) demands that direct identifiers leave
  * the serving layer but analysis must still join and count by subject.
  *
  * Three operators, all map-only codegen'd column expressions — zero
  * shuffle, zero state, applied inside the scan stage like the PII
  * redaction pass (`TextAnalysis.redactPii`):
  *
  *  - [[pseudonym]] — keyed deterministic token: `sha2(salt ‖ ':' ‖
  *    value)` truncated to `width` hex chars. Same (salt, value) → same
  *    token everywhere, so FK joins survive pseudonymization
  *    (referential integrity is the whole point — hashing each table
  *    with a different salt would orphan every fact row); different salt
  *    → unlinkable corpus, which is what makes token tables per-purpose
  *    revocable. NOT encryption: re-identification requires the salt
  *    (kept out of the serving layer), and truncation bounds the token
  *    join width.
  *  - [[pseudonymize]] — apply [[pseudonym]] to a set of key columns in
  *    place, preserving everything else. Nulls stay null: an absent
  *    identifier must not collapse to the hash of the empty string, or
  *    every null key would become one giant join-key bucket.
  *  - [[maskTail]] — format-preserving display mask (`****3456`): keeps
  *    the trailing `keep` chars, masks the rest — the account-number
  *    treatment for human-facing surfaces where the shape must survive
  *    but the value must not. Values no longer than `keep` mask fully:
  *    a 4-char account number displayed intact would be a leak, not a
  *    mask.
  *
  * Collision note: at 16 hex chars (64 bits) a corpus of n keys has
  * ~n²/2⁶⁵ expected collisions — negligible below ~10⁹ keys; widen
  * `width` for beyond-that cardinalities. Truncated SHA-256 keeps
  * uniformity, so token-keyed aggregations inherit the clear key's
  * distribution (no new skew).
  */
object Masking {

  /** Deterministic keyed token for one column. */
  def pseudonym(c: Column, salt: String, width: Int = 16): Column = {
    require(width >= 8 && width <= 64,
      s"pseudonym width must be in [8,64] hex chars, got $width")
    when(c.isNull, lit(null).cast("string"))
      .otherwise(substring(
        sha2(concat_ws(":", lit(salt), c.cast("string")), 256), 1, width))
  }

  /** Replace each of `keyCols` with its keyed token, in place. */
  def pseudonymize(df: DataFrame, keyCols: Seq[String], salt: String,
                   width: Int = 16): DataFrame =
    keyCols.foldLeft(df)((d, k) =>
      d.withColumn(k, pseudonym(col(k), salt, width)))

  /** Display mask keeping the last `keep` characters. */
  def maskTail(c: Column, keep: Int = 4, maskChar: String = "*"): Column = {
    require(keep >= 0, s"keep must be non-negative, got $keep")
    require(maskChar.length == 1, "maskChar must be a single character")
    val s = c.cast("string")
    when(c.isNull, lit(null).cast("string"))
      .when(length(s) <= keep, regexp_replace(s, "(?s).", maskChar))
      .otherwise(concat(
        repeat(lit(maskChar), length(s) - lit(keep)),
        substring(s, -keep, keep)))
  }
}
