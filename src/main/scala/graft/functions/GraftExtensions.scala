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
  * and the flagship whole-table operators as TABLE-VALUED functions
  * (see [[GraftExtensions.tableBuilders]]): scd2_from_changelog,
  * dedup_latest, upsert_by_key, minhash_lsh, fk_orphans — plus the
  * persisted index tier's serve paths: search_bm25, phrase_search,
  * vector_topk, cluster_assignments.
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
    GraftExtensions.tableBuilders.foreach { case (name, builder) =>
      ext.injectTableFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        GraftExtensions.noDriverParallelism(builder)))
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

  private def boolArg(e: Expression, name: String): Boolean = e match {
    case Literal(v: Boolean, _) => v
    case other => throw new IllegalArgumentException(
      s"$name must be a boolean literal, got $other")
  }

  // ── TABLE-VALUED surfaces for the flagship whole-table operators ────
  //
  // The engine is API-first; the reference's consumers are SQL-first
  // (dbt models over Snowflake). These TVFs close that gap: a SQL user
  // names a registered view and literal parameters, and the TVF expands
  // to the SAME DataFrame plan the Scala API builds — one
  // implementation, two surfaces. Input tables are passed BY NAME
  // (string literal resolved through the active session's catalog) —
  // Spark's TVF arguments are expressions, and a name keeps the surface
  // usable from pure SQL. Column lists are comma-separated; ordering
  // items accept an `desc`/`asc` suffix (default desc — "latest wins",
  // these operators' common case).
  //
  //   SELECT * FROM scd2_from_changelog('events_v', 'user_id', 'ts', 'event_id')
  //   SELECT * FROM dedup_latest('events_v', 'user_id,event_type', 'ts desc,event_id desc')
  //   SELECT * FROM upsert_by_key('cur_v', 'inc_v', 'id', 'seq desc')
  //   SELECT * FROM minhash_lsh('docs_v', 'doc_id', 'text', 16, 2, 0.25)
  //   SELECT * FROM fk_orphans('txns_v', 'accts_v', 'account_id')

  private def csv(s: String): Seq[String] =
    s.split(",").map(_.trim).filter(_.nonEmpty).toSeq

  private def orderCols(s: String): Seq[org.apache.spark.sql.Column] =
    csv(s).map { item =>
      item.split("\\s+").toSeq match {
        case Seq(c) => org.apache.spark.sql.functions.col(c).desc
        case Seq(c, dir) if dir.equalsIgnoreCase("desc") =>
          org.apache.spark.sql.functions.col(c).desc
        case Seq(c, dir) if dir.equalsIgnoreCase("asc") =>
          org.apache.spark.sql.functions.col(c).asc
        case _ => throw new IllegalArgumentException(
          s"bad ordering item '$item' (expected 'col [asc|desc]')")
      }
    }

  private def table(name: String): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.SparkSession.active.table(name)

  private def numArg(e: Expression, name: String): Double = e match {
    case Literal(v: Int, _) => v.toDouble
    case Literal(v: Long, _) => v.toDouble
    case Literal(v: Double, _) => v
    case Literal(v: java.math.BigDecimal, _) => v.doubleValue()
    case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$name must be a numeric literal, got $other")
  }

  /** TVF builders execute INSIDE the analyzer's function resolution,
    * which holds the SessionCatalog monitor — any engine path that fans
    * work onto driver threads (graft.Par) would deadlock there, because
    * the pool threads' own plan analysis needs that same lock. Builders
    * therefore run with Par pinned to the calling thread.
    */
  private def noDriverParallelism(
      b: Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    es => graft.Par.sequentialInThisThread(b(es))

  val tableBuilders: Seq[(String, Seq[Expression] =>
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)] = Seq(
    "scd2_from_changelog" -> (es =>
      graft.gold.Scd2Merge.fromChangeLog(
        table(strArg(es(0), "table")),
        csv(strArg(es(1), "keys")),
        strArg(es(2), "tsCol"),
        if (es.length > 3) csv(strArg(es(3), "tieBreak")) else Nil)
        .queryExecution.logical),
    "dedup_latest" -> (es =>
      graft.silver.Staging.dedupLatest(
        table(strArg(es(0), "table")),
        csv(strArg(es(1), "keys")),
        orderCols(strArg(es(2), "ordering")))
        .queryExecution.logical),
    "upsert_by_key" -> (es =>
      graft.gold.UpsertByKey(
        table(strArg(es(0), "current")),
        table(strArg(es(1), "incoming")),
        csv(strArg(es(2), "keys")),
        orderCols(strArg(es(3), "ordering")))
        .queryExecution.logical),
    "minhash_lsh" -> (es =>
      graft.operators.Dedup.minHashLsh(
        table(strArg(es(0), "table")),
        strArg(es(1), "idCol"),
        strArg(es(2), "textCol"),
        bands = numArg(es(3), "bands").toInt,
        rowsPerBand = numArg(es(4), "rowsPerBand").toInt,
        minEstJaccard = numArg(es(5), "minEstJaccard"))
        .queryExecution.logical),
    "fk_orphans" -> (es =>
      graft.silver.Quality.relationships(
        table(strArg(es(0), "child")),
        strArg(es(1), "childKey"),
        table(strArg(es(2), "parent")),
        strArg(es(3), "parentKey"))
        .queryExecution.logical),

    // ── index-tier serving: the PERSISTED indexes from pure SQL. The
    //    first argument is the index root (a path literal — index state
    //    lives under a storage root, not the session catalog); the TVF
    //    expands to the identical serve plan the Scala API builds, so
    //    document text / raw vectors are never read at query time.
    //
    //   SELECT * FROM search_bm25('/idx/s', 'data,bank,risk')
    //   SELECT * FROM phrase_search('/idx/s', 'exact phrase words')
    //   SELECT * FROM vector_topk('/idx/v', 'queries_v', 'vec_id', 'embedding', 5, 0)
    //   SELECT * FROM cluster_assignments('/idx/c')
    "search_bm25" -> (es =>
      graft.operators.SearchIndex.search(
        org.apache.spark.sql.SparkSession.active,
        graft.operators.SearchIndex.State(strArg(es(0), "indexRoot")),
        csv(strArg(es(1), "terms")))
        .queryExecution.logical),
    "phrase_search" -> (es =>
      graft.operators.SearchIndex.phraseSearch(
        org.apache.spark.sql.SparkSession.active,
        graft.operators.SearchIndex.State(strArg(es(0), "indexRoot")),
        strArg(es(1), "phrase").trim.split("\\s+").toSeq.filter(_.nonEmpty))
        .queryExecution.logical),
    // nProbe ≤ 0 means FULL probe (exact over the index — brute-force
    // equivalent); a SQL user has no Scala-side nCells() to call
    "vector_topk" -> (es => {
      val spark = org.apache.spark.sql.SparkSession.active
      val st = graft.operators.VectorIndex.State(strArg(es(0), "indexRoot"))
      val nProbeArg = numArg(es(5), "nProbe").toInt
      val nProbe = if (nProbeArg <= 0)
        graft.operators.VectorIndex.nCells(spark, st) else nProbeArg
      graft.operators.VectorIndex.topK(spark, st,
        table(strArg(es(1), "queries")),
        strArg(es(2), "idCol"), strArg(es(3), "vecCol"),
        k = numArg(es(4), "k").toInt, nProbe = nProbe)
        .queryExecution.logical
    }),
    "cluster_assignments" -> (es =>
      graft.operators.ClusterIndex.clusters(
        org.apache.spark.sql.SparkSession.active,
        graft.operators.ClusterIndex.State(strArg(es(0), "indexRoot")))
        .queryExecution.logical),
    // the LSH index's family (numTables/numPlanes) is frozen IN the
    // index state, so unlike vector_topk there is no probe-width knob —
    // serve fidelity was fixed at first fold (numPlanes = 0 ≡ exact)
    //   SELECT * FROM lsh_topk('/idx/l', 'queries_v', 'vec_id', 'embedding', 5)
    "lsh_topk" -> (es =>
      graft.operators.LshVectorIndex.topK(
        org.apache.spark.sql.SparkSession.active,
        graft.operators.LshVectorIndex.State(strArg(es(0), "indexRoot")),
        table(strArg(es(1), "queries")),
        strArg(es(2), "idCol"), strArg(es(3), "vecCol"),
        k = numArg(es(4), "k").toInt)
        .queryExecution.logical),

    // ── GOVERNANCE mutations from pure SQL — procedure-shaped TVFs:
    //    the mutation EXECUTES when the statement is analyzed (the SQL
    //    analogue of CALL), and the returned table is its receipt. The
    //    build+serve TVFs above already cover the read path; these close
    //    the reference's GDPR loop for SQL-first consumers — ack an
    //    erasure, then upgrade the pending ledgers — with no Scala in
    //    sight. `kind` names the index tier ('search' | 'vector' |
    //    'cluster' | 'managed_vector' | 'lsh_vector'); subjects are
    //    passed as a
    //    registered view name, the same convention as every input table
    //    here.
    //
    //   SELECT * FROM erase_subjects('search', '/idx/s', 'subjects_v', true)
    //   SELECT * FROM materialize_erasures('search', '/idx/s')
    "erase_subjects" -> (es => {
      val spark = org.apache.spark.sql.SparkSession.active
      val kind = strArg(es(0), "kind")
      val root = strArg(es(1), "indexRoot")
      val subjects = table(strArg(es(2), "subjectsView"))
      val deferred = es.length > 3 && boolArg(es(3), "deferred")
      val receipt = kind match {
        case "search" => graft.operators.ErasureSweep.eraseDerived(spark,
          subjects, search = Seq(graft.operators.SearchIndex.State(root)),
          deferred = deferred)
        case "vector" => graft.operators.ErasureSweep.eraseDerived(spark,
          subjects, vector = Seq(graft.operators.VectorIndex.State(root)),
          deferred = deferred)
        case "cluster" => graft.operators.ErasureSweep.eraseDerived(spark,
          subjects, cluster = Seq(graft.operators.ClusterIndex.State(root)),
          deferred = deferred)
        case "managed_vector" => graft.operators.ErasureSweep.eraseDerived(
          spark, subjects,
          managedVector = Seq(graft.operators.VectorIndex.Managed(root)),
          deferred = deferred)
        case "lsh_vector" => graft.operators.ErasureSweep.eraseDerived(
          spark, subjects,
          lsh = Seq(graft.operators.LshVectorIndex.State(root)),
          deferred = deferred)
        case other => throw new IllegalArgumentException(
          s"erase_subjects: unknown kind '$other' (expected search | " +
            "vector | cluster | managed_vector | lsh_vector)")
      }
      receipt.queryExecution.logical
    }),
    "materialize_erasures" -> (es => {
      val spark = org.apache.spark.sql.SparkSession.active
      val kind = strArg(es(0), "kind")
      val root = strArg(es(1), "indexRoot")
      val tables = kind match {
        case "search" =>
          val st = graft.operators.SearchIndex.State(root)
          Seq(st.postingsTable, st.docstatsTable, st.positionsTable)
        case "vector" =>
          Seq(graft.operators.VectorIndex.State(root).postingsTable)
        case "cluster" =>
          val st = graft.operators.ClusterIndex.State(root)
          Seq(st.postingsTable, st.clustersTable)
        case "managed_vector" =>
          val m = graft.operators.VectorIndex.Managed(root)
          Seq(graft.operators.VectorIndex.active(spark, m).postingsTable)
        case "lsh_vector" =>
          val st = graft.operators.LshVectorIndex.State(root)
          Seq(st.vectorsTable, st.bandsTable)
        case other => throw new IllegalArgumentException(
          s"materialize_erasures: unknown kind '$other' (expected search " +
            "| vector | cluster | managed_vector | lsh_vector)")
      }
      // same contract as the Scala surface: the caller owns the
      // writer-quiet window (scheduled maintenance slot). NOTE: every TVF
      // builder runs under noDriverParallelism (the SessionCatalog-monitor
      // deadlock guard), so this Par.run always degrades to in-order
      // execution on the calling thread — the SQL surface rewrites the
      // tables SEQUENTIALLY. Only the Scala surface
      // (BaseDelta.materializeErasuresAll) gets driver-side overlap; kept
      // as Par.run so the two surfaces share one code shape.
      val rows = graft.Par.run(tables.map { t => () =>
        val had = graft.gold.BaseDelta.pendingTombstones(spark, t).nonEmpty
        val vacuumed = graft.gold.BaseDelta.materializeErasures(spark, t)
        (t.path, had, vacuumed.length.toLong,
          graft.gold.BaseDelta.pendingTombstones(spark, t).isEmpty)
      })
      spark.createDataFrame(rows)
        .toDF("table_path", "had_pending", "n_paths_vacuumed",
          "pending_cleared")
        .queryExecution.logical
    }))

  /** Register into an already-built session (tests, spark-shell). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder)
    }
    tableBuilders.foreach { case (name, builder) =>
      spark.sessionState.tableFunctionRegistry.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        noDriverParallelism(builder))
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
