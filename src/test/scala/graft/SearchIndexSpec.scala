package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{SearchIndex, TextAnalysis}

/** Incremental BM25 index: folded state scores identically to the
  * from-scratch bm25 over the accumulated corpus, under any batch cut;
  * replays are no-ops; zero-token docs never pollute the stats.
  */
class SearchIndexSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toSeq.toDF("doc_id", "text")

  private val corpus = Seq(
    (1L, "bank account risk data bank"),
    (2L, "data data lake house"),
    (3L, "risk model bank"),
    (4L, "totally unrelated words here"),
    (5L, ""),                               // zero tokens: not in N/avgdl
    (6L, "account account account"))

  private val query = Seq("bank", "data", "account")

  private def sameScores(a: DataFrame, b: DataFrame): Unit =
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"left:\n${a.orderBy("doc_id").collect().mkString("\n")}" +
        s"\nright:\n${b.orderBy("doc_id").collect().mkString("\n")}")

  test("any fold cut scores identically to from-scratch bm25") {
    val expected = TextAnalysis.bm25(docs(corpus: _*), "doc_id", "text", query)
    for (cuts <- Seq(Seq(2, 4), Seq(1, 5), Seq(3, 3))) {
      val st = SearchIndex.State(tmpDir("si") + "/s")
      val batches = Seq(corpus.take(cuts(0)),
        corpus.slice(cuts(0), cuts(1)), corpus.drop(cuts(1)))
        .filter(_.nonEmpty)
      batches.zipWithIndex.foreach { case (b, i) =>
        SearchIndex.fold(spark, st, docs(b: _*), i.toLong, "doc_id", "text")
      }
      sameScores(SearchIndex.search(spark, st, query), expected)
    }
  }

  test("replayed batch id is a no-op; stats stay exact") {
    val st = SearchIndex.State(tmpDir("si-replay") + "/s")
    val b0 = corpus.take(3); val b1 = corpus.drop(3)
    SearchIndex.fold(spark, st, docs(b0: _*), 0L, "doc_id", "text")
    SearchIndex.fold(spark, st, docs(b1: _*), 1L, "doc_id", "text")
    val before = SearchIndex.search(spark, st, query)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    SearchIndex.fold(spark, st, docs(b1: _*), 1L, "doc_id", "text")
    val after = SearchIndex.search(spark, st, query)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(after == before, "replay changed scores")
  }

  test("only docs matching a query term return; n_terms counts matches") {
    val st = SearchIndex.State(tmpDir("si-match") + "/s")
    SearchIndex.fold(spark, st, docs(corpus: _*), 0L, "doc_id", "text")
    val out = SearchIndex.search(spark, st, query)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 6L))
    assert(out(1L) == 3 && out(2L) == 1 && out(3L) == 1 && out(6L) == 1)
  }

  test("phraseSearch from folded positional postings ≡ phraseMatch over the corpus") {
    val st = SearchIndex.State(tmpDir("si-phrase") + "/s")
    val batches = Seq(corpus.take(2), corpus.slice(2, 4), corpus.drop(4))
    batches.zipWithIndex.foreach { case (b, i) =>
      SearchIndex.fold(spark, st, docs(b: _*), i.toLong, "doc_id", "text") }
    for (phrase <- Seq(Seq("bank", "account"), Seq("data", "data"),
      Seq("account", "account"), Seq("risk", "model", "bank"))) {
      val idx = SearchIndex.phraseSearch(spark, st, phrase)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val scan = TextAnalysis.phraseMatch(docs(corpus: _*), "doc_id", "text",
          phrase)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(idx == scan, s"phrase $phrase: index=$idx scan=$scan")
    }
    // hand check: overlapping repeats in doc 6 ("account account account")
    val rep = SearchIndex.phraseSearch(spark, st, Seq("account", "account"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rep == Map(6L -> 2L), rep)
    // replayed fold changes nothing
    SearchIndex.fold(spark, st, docs(batches(2): _*), 2L, "doc_id", "text")
    assert(SearchIndex.phraseSearch(spark, st, Seq("bank", "account"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      == Map(1L -> 1L))
  }

  test("erase: scores identical to an index that never saw the docs; folds continue; replays cannot resurrect") {
    val st = SearchIndex.State(tmpDir("si-erase") + "/s")
    val b0 = corpus.take(3); val b1 = corpus.drop(3)
    SearchIndex.fold(spark, st, docs(b0: _*), 0L, "doc_id", "text")
    SearchIndex.fold(spark, st, docs(b1: _*), 1L, "doc_id", "text")
    SearchIndex.erase(spark, st, Seq(2L, 6L).toDF("doc_id"))
    // bit-identical to a from-scratch index over the surviving corpus —
    // including the IDF/avgdl statistics the erased docs contributed to
    val survivors = corpus.filterNot(d => d._1 == 2L || d._1 == 6L)
    sameScores(SearchIndex.search(spark, st, query),
      TextAnalysis.bm25(docs(survivors: _*), "doc_id", "text", query))
    // phrase serving survives for other docs
    assert(SearchIndex.phraseSearch(spark, st, Seq("bank", "account"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == Map(1L -> 1L))
    // folding continues after an erasure
    SearchIndex.fold(spark, st, docs((7L, "account risk data")), 2L,
      "doc_id", "text")
    sameScores(SearchIndex.search(spark, st, query),
      TextAnalysis.bm25(docs(survivors :+ (7L, "account risk data"): _*),
        "doc_id", "text", query))
    // a redelivered OLD batch id must not resurrect the erased docs
    SearchIndex.fold(spark, st, docs(b0: _*), 0L, "doc_id", "text")
    sameScores(SearchIndex.search(spark, st, query),
      TextAnalysis.bm25(docs(survivors :+ ((7L, "account risk data")): _*),
        "doc_id", "text", query))
  }

  test("query terms normalize through the fold's tokenizer (case/whitespace)") {
    val st = SearchIndex.State(tmpDir("si-norm") + "/s")
    SearchIndex.fold(spark, st, docs(corpus: _*), 0L, "doc_id", "text")
    // the index stores lower(trim(text)) tokens; a caller's "Bank" /
    // " data " must score identically to the normalized terms, not
    // silently match zero postings
    sameScores(SearchIndex.search(spark, st, Seq("Bank", " data ", "ACCOUNT")),
      SearchIndex.search(spark, st, query))
    val shouty = SearchIndex.phraseSearch(spark, st, Seq("BANK", " Account"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(shouty == Map(1L -> 1L), shouty)
  }
}
