package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting.
  *
  * All are per-row scalar pipelines over built-in (codegen'd) functions —
  * embarrassingly parallel, no shuffle, so they scale linearly with input
  * splits at 100 TB. Every derivation is expressible in ANSI SQL for the
  * DuckDB oracle.
  */
object TextAnalysis {

  /** Whitespace tokens, lowercased. */
  def tokens(text: Column): Column =
    split(lower(trim(text)), "\\s+")

  /** BPE-ish tokenizer: letter runs, digit runs, or single punctuation —
    * the standard pre-tokenization split. Regex kept RE2-compatible so the
    * DuckDB oracle matches byte-for-byte.
    */
  val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpePattern), lit(0))

  /** Small fixed stopword list (public, language-agnostic subset). */
  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "be")

  /** Per-language marker-token profiles for n-gram-free heuristic language
    * ID: score = count of profile hits in the token set; argmax wins,
    * deterministic tie-break by language code order.
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en" -> Seq("the", "a", "and", "is", "of", "to", "in", "that"),
    "es" -> Seq("el", "la", "los", "las", "que", "es", "un", "una"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "que"),
    "zh" -> Seq("de", "shi", "le", "zai", "you", "wo", "ta", "men"))

  /** Count how many tokens of `toks` are in `vocab` — one-pass native
    * counter (same semantics as `size(filter(toks, isin(vocab)))`).
    */
  private def hitCount(toks: Column, vocab: Seq[String]): Column =
    graft.functions.HashFunctions.tokenSetCounts(toks, Seq(vocab))(0)

  /** Heuristic language ID: (doc_id-preserving) adds `lang_pred` plus the
    * per-language scores. Greatest-score-wins with lexicographic tie-break
    * (first profile in order wins ties).
    */
  def langId(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    // all profile scores from ONE token pass (native bitmask counter)
    val allScores = graft.functions.HashFunctions.tokenSetCounts(
      toks, LangProfiles.map(_._2))
    val scored = LangProfiles.zipWithIndex.foldLeft(
      df.withColumn("__scores", allScores)) { case (d, ((lang, _), i)) =>
      d.withColumn(s"score_$lang", col("__scores")(i))
    }.drop("__scores")
    // argmax via chained CASE: strictly-greater beats, ties keep earlier
    val pred = LangProfiles.tail.foldLeft(
      (lit(LangProfiles.head._1), col(s"score_${LangProfiles.head._1}"))) {
      case ((bestLang, bestScore), (lang, _)) =>
        val s = col(s"score_$lang")
        (when(s > bestScore, lit(lang)).otherwise(bestLang),
         when(s > bestScore, s).otherwise(bestScore))
    }._1
    scored.withColumn("lang_pred", pred)
  }

  /** Quality metrics: char/token counts, mean token length, stopword
    * ratio, punctuation ratio, uppercase ratio — the standard cheap
    * document-quality features.
    */
  def quality(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    df.withColumn("n_chars_m", length(t))
      .withColumn("n_tokens", size(toks))
      .withColumn("n_unique_tokens", size(array_distinct(toks)))
      // sum of token lengths == non-whitespace chars of the lowered text:
      // one codegen'd regex pass instead of an interpreted aggregate() HOF
      // over the token array (same value; lower() can change char counts on
      // special code points, so it must run before the length)
      .withColumn("mean_token_len",
        length(regexp_replace(lower(trim(t)), "\\s+", "")).cast("double")
          / size(toks))
      .withColumn("stopword_ratio",
        hitCount(toks, Stopwords).cast("double") / size(toks))
      .withColumn("punct_ratio",
        (length(t) - length(regexp_replace(t, "[^A-Za-z0-9\\s]", ""))).cast("double")
          / length(t))
      .withColumn("upper_ratio",
        (length(t) - length(regexp_replace(t, "[A-Z]", ""))).cast("double")
          / length(t))
  }

  /** Repetition metrics (the Gopher/RefinedWeb-style intra-document
    * repetition filters): duplicate-token ratio and the char mass of the
    * heaviest single token. Highly repetitive documents (boilerplate,
    * keyword stuffing, degenerate generations) score high and get
    * filtered before training.
    *
    * Shape: explode tokens → count per (doc, token) → per-doc aggregate.
    * Two hash-aggregate shuffles with map-side combine — the inverted-index
    * build shape, linear in corpus token count, no per-row quadratic work.
    */
  def repetition(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val perTok = df
      .select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col(idCol), col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("chars", col("cnt") * length(col("tok")))
    perTok.groupBy(col(idCol)).agg(
      sum(col("cnt")).as("n_tokens"),
      count(lit(1)).as("n_distinct_tokens"),
      (max(col("chars")).cast("double") / sum(col("chars")).cast("double"))
        .as("top_token_char_ratio"))
      .withColumn("dup_token_ratio",
        (col("n_tokens") - col("n_distinct_tokens")).cast("double") / col("n_tokens"))
  }

  /** PII scrubbing: redact emails and international-format phone numbers
    * with a placeholder token. Patterns are RE2-compatible (no backrefs /
    * lookaround) so the DuckDB oracle applies byte-identical replacement;
    * map-only, codegen'd, linear.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\+[0-9]{1,3} [0-9]{3}-[0-9]{3}-[0-9]{4}"
  def redactPii(text: Column, token: String = "[PII]"): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, token),
      PhonePattern, token)

  /** Count of PII matches (pre-redaction audit metric). */
  def piiCount(text: Column): Column =
    regexp_count(text, lit(EmailPattern)) + regexp_count(text, lit(PhonePattern))

  /** Token counts under both tokenizers. `regexp_count` instead of
    * `size(regexp_extract_all(…))` — counts matches without materializing
    * the token array (same result, no per-row allocation).
    */
  def tokenCounts(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_ws_tokens", size(tokens(col(textCol))))
      .withColumn("n_bpe_tokens", regexp_count(col(textCol), lit(BpePattern)))

  /** Polynomial rolling-hash fingerprint over whitespace tokens:
    * h = fold(h * 31 + tokenValue) mod p, tokenValue = length + 7 ·
    * ascii(first char). Pure integer arithmetic with an explicit modulus so
    * the DuckDB oracle (list_reduce) reproduces it exactly.
    */
  val FingerprintMod = 1000000007L
  def fingerprint(text: Column): Column = {
    val tokVal = (t: Column) => length(t) + lit(7) * ascii(substring(t, 1, 1))
    aggregate(tokens(text), lit(0L),
      (acc, t) => (acc * 31L + tokVal(t).cast("long")) % FingerprintMod)
  }
}
