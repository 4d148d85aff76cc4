package graft.silver

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Crypto-shredding — per-subject erasure WITHOUT rewriting the data:
  * sensitive columns are encrypted at ingest with a per-subject key held
  * in a (small) key table; "erasing" a subject deletes ONE key row, after
  * which every copy of their ciphertext — bronze, backups, retired
  * snapshot generations, downstream extracts — is unreadable. This is
  * the complement to [[graft.gold.Erasure]]: rewrite-based erasure costs
  * O(touched partitions) per request and must chase every replica;
  * shredding costs O(1) per request and covers immutable storage the
  * pipeline can no longer touch. The trade: reads pay a decrypt, and the
  * key table becomes Tier-0 data (it IS the personal data, legally).
  *
  * Mechanics:
  *  - [[subjectKeys]] — derive a deterministic 32-byte AES key per
  *    subject from a master secret (HKDF-shaped: SHA-256 of
  *    secret ‖ subject). Deterministic derivation means the key table
  *    can be rebuilt from the secret while subjects are live, yet
  *    deleting a subject's ROW still shreds them as long as the
  *    derivation input (the master secret) is rotated out of reach of
  *    old data — or keys are generated randomly and never derivable;
  *    the operator takes the table, not a policy.
  *  - [[encryptColumns]] / [[decryptColumns]] — AES-GCM via Spark's
  *    native `aes_encrypt`/`aes_decrypt` expressions (codegen'd,
  *    map-only); the key arrives by broadcast join on the subject
  *    column. GCM's random IV makes ciphertexts non-deterministic —
  *    fine for storage, and equality analytics belong on
  *    [[Masking.pseudonym]] tokens, not ciphertext.
  *  - Decrypt of a SHREDDED subject (no key row) yields null — the
  *    column null-discipline every downstream aggregate already
  *    handles. Unknown-key rows never error a 100-TB scan.
  *
  * Both paths are one broadcast join + map-only crypto expressions:
  * zero shuffles over the data.
  */
object CryptoShred {

  private val KeyCol = "__subject_key"

  /** Deterministic per-subject 32-byte key table from a master secret.
    * One row per distinct subject; subject-null rows get no key (their
    * payload stays plaintext — "unknown subject" cannot be shredded).
    */
  def subjectKeys(subjects: DataFrame, subjectCol: String,
                  masterSecret: String): DataFrame =
    subjects.select(col(subjectCol)).filter(col(subjectCol).isNotNull)
      .distinct()
      .withColumn(KeyCol,
        substring(sha2(concat_ws(":", lit(masterSecret),
          col(subjectCol).cast("string")), 256), 1, 32))

  /** Remove `toShred`'s rows from the key table — the O(1) erasure. */
  def shred(keys: DataFrame, subjectCol: String, toShred: DataFrame): DataFrame =
    keys.join(
      broadcast(toShred.select(col(toShred.columns.head).as(subjectCol))
        .distinct()),
      Seq(subjectCol), "left_anti")

  /** Encrypt `cols` (cast to string) per subject. Rows whose subject has
    * no key — or a null subject — keep null ciphertext AND their
    * plaintext is dropped, so data for an unkeyed subject never lands
    * readable by accident.
    */
  def encryptColumns(df: DataFrame, subjectCol: String, keys: DataFrame,
                     cols: Seq[String]): DataFrame = {
    val joined = df.join(broadcast(keys), Seq(subjectCol), "left")
    cols.foldLeft(joined)((d, c) =>
      d.withColumn(c,
        when(col(KeyCol).isNotNull,
          base64(aes_encrypt(col(c).cast("string"), col(KeyCol))))))
      .drop(KeyCol)
  }

  /** Decrypt `cols` per subject; shredded/unknown subjects → null. */
  def decryptColumns(df: DataFrame, subjectCol: String, keys: DataFrame,
                     cols: Seq[String]): DataFrame = {
    val joined = df.join(broadcast(keys), Seq(subjectCol), "left")
    cols.foldLeft(joined)((d, c) =>
      d.withColumn(c,
        when(col(KeyCol).isNotNull && col(c).isNotNull,
          try_aes_decrypt(unbase64(col(c)), col(KeyCol)).cast("string"))))
      .drop(KeyCol)
  }
}
