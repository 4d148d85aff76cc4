package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions, so `spark.sql` users get them too:
  *
  *   cosine_similarity(a, b), dot_product(a, b), word_shingles(text, k),
  *   minhash_signature(shingles, k), simhash64(tokens),
  *   norm_text(text), lsh_buckets(vec, tables, planes),
  *   ordered_pairs(arr), media_meta(payload), deflate_ratio(text),
  *   quantize_int8(vec), bpe_merge(symbols, 'l', 'r'),
  *   unicode_norm(text[, 'NFC'|'NFD'|'NFKC'|'NFKD'])
  *
  * Wire-up: `SparkSession.builder().withExtensions(new GraftExtensions)`
  * or config `spark.sql.extensions=graft.functions.GraftExtensions`;
  * for an already-built session use `GraftExtensions.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))
    }
    // opt-in COUNT(DISTINCT) → HLL++ acceleration (flag-gated per query)
    ext.injectOptimizerRule(graft.plans.ApproxDistinctRewrite(_))
    // opt-in band-join → bucketed equi-join (flag = explicit bucket width)
    ext.injectOptimizerRule(graft.plans.RangeJoinRewrite(_))
  }
}

object GraftExtensions {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_similarity" -> (es => CosineSimilarity(es(0), es(1))),
    "dot_product" -> (es => DotProduct(es(0), es(1))),
    "word_shingles" -> (es => WordShingles(es(0), intArg(es(1), "k"))),
    "minhash_signature" -> (es => MinHashSignature(es(0), intArg(es(1), "numHashes"))),
    "simhash64" -> (es => SimHash64(es(0))),
    "norm_text" -> (es => NormalizeText(es(0))),
    "lsh_buckets" -> (es => HyperplaneBuckets(es(0),
      intArg(es(1), "numTables"), intArg(es(2), "numPlanes"))),
    "ordered_pairs" -> (es => OrderedPairs(es(0))),
    "media_meta" -> (es => graft.operators.MediaMeta(es(0))),
    "deflate_ratio" -> (es => graft.operators.DeflateRatio(es(0))),
    "quantize_int8" -> (es => QuantizeInt8(es(0))),
    "bpe_merge" -> (es => graft.operators.BpeApplyMerge(es(0),
      strArg(es(1), "left"), strArg(es(2), "right"))),
    "unicode_norm" -> (es => UnicodeNormalize(es(0),
      if (es.length > 1) strArg(es(1), "form") else "NFC")))

  private def strArg(e: Expression, name: String): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
    case other => throw new IllegalArgumentException(
      s"$name must be a string literal, got $other")
  }

  /** Register into an already-built session (tests, spark-shell). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder)
    }
    // idempotent: experimental.extraOptimizations is a plain Seq
    val rules = spark.experimental.extraOptimizations
    if (!rules.exists(_.isInstanceOf[graft.plans.ApproxDistinctRewrite]))
      spark.experimental.extraOptimizations =
        rules :+ graft.plans.ApproxDistinctRewrite(spark)
    val rules2 = spark.experimental.extraOptimizations
    if (!rules2.exists(_.isInstanceOf[graft.plans.RangeJoinRewrite]))
      spark.experimental.extraOptimizations =
        rules2 :+ graft.plans.RangeJoinRewrite(spark)
  }
}
