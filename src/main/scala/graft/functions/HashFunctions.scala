package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native hash-sketch expressions for the fuzzy-dedup / ANN operators.
  *
  * Why native: the declarative forms (32 × `transform`+`array_min` HOFs per
  * row, or 32 hyperplane projections as `zip_with`/`aggregate` chains) are
  * interpreted per element — at 100 TB the sketch computation dominates the
  * scan. These expressions do the whole sketch in one tight JVM loop per
  * row: one FNV-64 pass per shingle + Carter-Wegman double hashing for all
  * `numHashes` MinHash slots (2 hashes instead of k per shingle), one
  * multiply-accumulate sweep for all LSH hyperplanes.
  *
  * Codegen: every expression implements `doGenCode` as a single static call
  * into `SketchKernels` (the pattern of Spark's own `StaticInvoke`), so a
  * sketch projection no longer breaks its stage out of whole-stage codegen
  * the way `CodegenFallback` did — the scan → sketch → explode pipeline
  * stays one generated loop.
  *
  * All hashing is deterministic and versioned here (FNV-1a 64 +
  * splitmix64 finalizer — both public-domain constructions), so sketches
  * are stable across runs, partitions, and Spark versions.
  */
object HashFunctions {

  @inline final def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** FNV-1a 64 over UTF-8 bytes, with a seed folded in and a splitmix64
    * finalizer for avalanche.
    */
  final def hashBytes(s: UTF8String, seed: Long): Long = {
    val bytes = s.getBytes
    var h = 0xCBF29CE484222325L ^ seed
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * 0x100000001B3L
      i += 1
    }
    splitmix64(h)
  }

  private def co(e: Expression): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(e)
  private def ex(c: Column): Expression =
    org.apache.spark.sql.graftbridge.ColumnBridge.expr(c)

  /** MinHash signature of an array<string> shingle set. */
  def minhash(shingles: Column, numHashes: Int): Column =
    co(MinHashSignature(ex(shingles), numHashes))

  /** Distinct word k-shingles of normalized text (lowercase, whitespace
    * runs collapsed), joined with single spaces. Semantics match the
    * declarative form `array_distinct(transform(sequence…, slice+concat_ws))`
    * over `split(normText, " ")` — but one pass, no intermediate arrays.
    */
  def wordShingles(text: Column, k: Int): Column =
    co(WordShingles(ex(text), k))

  /** Normalized text: lowercase, trim, whitespace runs collapsed to one
    * space — native equivalent of
    * `regexp_replace(lower(trim(text)), "\\s+", " ")` (ASCII whitespace,
    * matching Java regex `\s` semantics).
    */
  def normText(text: Column): Column = co(NormalizeText(ex(text)))

  /** Per-table hyperplane-LSH bucket ids of an array<float> vector. */
  def lshBuckets(vec: Column, numTables: Int, numPlanes: Int): Column =
    co(HyperplaneBuckets(ex(vec), numTables, numPlanes))

  /** 64-bit SimHash of an array<string> token list (term-frequency
    * weighted bit votes).
    */
  def simhash64(tokens: Column): Column =
    co(SimHash64(ex(tokens)))

  /** All ordered pairs (i < j) of an array, as array<struct<a,b>>.
    * MATERIALIZES the n(n−1)/2 array — fine for small n; for bucket-scale
    * arrays use `orderedPairsGen`, which streams.
    */
  def orderedPairs(arr: Column): Column = co(OrderedPairs(ex(arr)))

  /** All ordered pairs (i < j) of an array as a GENERATOR (two output
    * columns `a`, `b`): pairs are yielded lazily into the downstream
    * operator, so a bucket of b members costs O(b) memory, not the
    * O(b²) a materialized pair array would (a 4096-member bucket is ~8M
    * pairs — half a GB as an array, a streamed trickle as a generator).
    */
  def orderedPairsGen(arr: Column): Column = co(OrderedPairsGen(ex(arr)))

  /** Per-vocabulary membership counts of a token array, one pass. */
  def tokenSetCounts(tokens: Column, vocabularies: Seq[Seq[String]]): Column =
    co(TokenSetCounts(ex(tokens), vocabularies))

  /** Unicode normalization (NFC/NFD/NFKC/NFKD) — Spark has no built-in;
    * web-crawled corpora mix composed and decomposed forms of the same
    * grapheme ("é" as U+00E9 vs e+U+0301), which silently splits
    * dedup/token/vocabulary keys until canonicalized. Map-only, codegen'd;
    * NFC output matches DuckDB's `nfc_normalize` (both implement UAX #15).
    */
  def unicodeNorm(text: Column, form: String = "NFC"): Column =
    co(UnicodeNormalize(ex(text), form))
}

/** Per-row sketch kernels, written as static-forwardable methods so
  * generated code can call them directly (`SketchKernels.minhash(arr, 32)`).
  * Keeping the loops here instead of inlined Janino source keeps the
  * generated classes small (Janino has a 64KB method limit) while the
  * JIT still sees one monomorphic static call per row.
  */
object SketchKernels {

  /** Lowercase + trim + collapse whitespace runs, one pass, no regex
    * engine. `\s` in Java regex (no UNICODE_CHARACTER_CLASS) =
    * [ \t\n\x0B\f\r]. Lowercasing delegates to `UTF8String.toLowerCase` —
    * the exact code path of Spark's `lower()` — so special code points
    * (e.g. 'İ' → "i̇", a two-char expansion) normalize identically to the
    * declarative form; whitespace is collapsed first (case mappings never
    * produce whitespace, so the order is immaterial to the result).
    */
  def normalize(input: UTF8String): UTF8String = {
    val s = input.toString
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var pendingSpace = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (isWs(c)) { if (sb.length() > 0) pendingSpace = true }
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    UTF8String.fromString(sb.toString).toLowerCase
  }

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Unicode normalization with an ASCII fast path: one-byte-per-char
    * input (numBytes == numChars) is already in every normal form, so the
    * common crawl-text case returns the input untouched — no String
    * round-trip, no Normalizer call.
    */
  def unicodeNormalize(input: UTF8String, form: java.text.Normalizer.Form): UTF8String = {
    if (input.numBytes() == input.numChars()) return input
    val s = input.toString
    if (java.text.Normalizer.isNormalized(s, form)) input
    else UTF8String.fromString(java.text.Normalizer.normalize(s, form))
  }

  /** text → distinct word k-shingles. Same `UTF8String.toLowerCase`
    * lowercasing as `normalize`, so shingles of raw text and of
    * `normText(text)` agree.
    */
  def wordShingles(input: UTF8String, k: Int): ArrayData = {
    val text = input.toLowerCase.toString
    val toks = text.split("\\s+").filter(_.nonEmpty)
    if (toks.length < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= toks.length - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var n = 0
    while (it.hasNext) { out(n) = UTF8String.fromString(it.next()); n += 1 }
    new GenericArrayData(out)
  }

  /** array<string> → `numHashes` MinHash slots via Kirsch–Mitzenmacher
    * double hashing: g_i(s) = h1(s) + i·h2(s).
    */
  def minhash(arr: ArrayData, numHashes: Int): ArrayData = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val s = arr.getUTF8String(j)
      if (s != null) {
        val h1 = HashFunctions.hashBytes(s, 0x1234567887654321L)
        val h2 = HashFunctions.hashBytes(s, 0x0F0E0D0C0B0A0908L) | 1L
        var i = 0
        var g = h1
        while (i < numHashes) {
          if (g < mins(i)) mins(i) = g
          g += h2
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  /** array<string> → 64-bit SimHash (bit b set when the tf-weighted vote
    * of token-hash bit b is positive).
    */
  def simhash(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val s = arr.getUTF8String(j)
      if (s != null) {
        val h = HashFunctions.hashBytes(s, 0x5132697801234567L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      j += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  /** array<float> → one bucket id per LSH table; bucket bit p is the sign
    * of the projection onto a fixed pseudo-random hyperplane whose
    * component (t,p,d) is splitmix64 of the triple mapped to [-1,1].
    */
  def hyperplaneBuckets(v: ArrayData, numTables: Int, numPlanes: Int): ArrayData = {
    val dims = v.numElements()
    val buckets = new Array[Int](numTables)
    var t = 0
    while (t < numTables) {
      var bucket = 0
      var p = 0
      while (p < numPlanes) {
        var proj = 0.0
        var d = 0
        val base = (t.toLong << 32) | (p.toLong << 16)
        while (d < dims) {
          val w = HashFunctions.splitmix64(base | d).toDouble / Long.MaxValue.toDouble
          proj += v.getFloat(d) * w
          d += 1
        }
        if (proj >= 0) bucket |= (1 << p)
        p += 1
      }
      buckets(t) = bucket
      t += 1
    }
    new GenericArrayData(buckets)
  }

  /** array<T> → all index-ordered pairs as array<struct<a,b>>. Elements are
    * defensively copied once (ArrayData.get may return views into a reused
    * buffer).
    */
  def orderedPairs(arr: ArrayData, elemType: DataType): ArrayData = {
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val elems = new Array[Any](n)
    var i = 0
    while (i < n) {
      elems(i) = arr.get(i, elemType) match {
        case r: org.apache.spark.sql.catalyst.InternalRow => r.copy()
        case s: UTF8String => s.clone()
        case a: ArrayData => a.copy()
        case v => v
      }
      i += 1
    }
    val out = new Array[Any](n * (n - 1) / 2)
    var idx = 0
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        out(idx) = org.apache.spark.sql.catalyst.InternalRow(elems(i), elems(j))
        idx += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** One-pass membership counting: each token looks up a bitmask of the
    * vocabularies containing it; set bits bump their counters.
    */
  def tokenSetCounts(arr: ArrayData, masks: java.util.HashMap[String, Integer],
                     numVocabs: Int): ArrayData = {
    val counts = new Array[Int](numVocabs)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val s = arr.getUTF8String(j)
      if (s != null) {
        val mask = masks.get(s.toString)
        if (mask != null) {
          var m = mask.intValue()
          while (m != 0) {
            val b = java.lang.Integer.numberOfTrailingZeros(m)
            counts(b) += 1
            m &= m - 1
          }
        }
      }
      j += 1
    }
    new GenericArrayData(counts)
  }
}

/** string → Unicode-normalized string under `form` (see
  * [[HashFunctions.unicodeNorm]]). The fast path skips normalization for
  * pure-ASCII input (always already in every normal form) without leaving
  * generated code.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {
  require(Set("NFC", "NFD", "NFKC", "NFKD")(form),
    s"unknown normalization form: $form")
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"unicode_norm needs a string argument, got ${child.dataType}")
  @transient private lazy val f = java.text.Normalizer.Form.valueOf(form)
  override def nullSafeEval(input: Any): Any =
    SketchKernels.unicodeNormalize(input.asInstanceOf[UTF8String], f)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val formRef = ctx.addReferenceObj("form", f, "java.text.Normalizer$Form")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SketchKernels.unicodeNormalize($a, $formRef);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** array<string> tokens → array<int> of per-vocabulary hit counts
  * (occurrence-counted, like `size(filter(toks, isin(vocab)))`) in ONE
  * pass over the tokens regardless of how many vocabularies are scored.
  */
case class TokenSetCounts(child: Expression, vocabularies: Seq[Seq[String]])
    extends UnaryExpression {
  require(vocabularies.nonEmpty && vocabularies.size <= 32)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  @transient private lazy val masks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    vocabularies.zipWithIndex.foreach { case (vocab, i) =>
      vocab.foreach { w =>
        val prev = m.getOrDefault(w, Integer.valueOf(0))
        m.put(w, Integer.valueOf(prev.intValue() | (1 << i)))
      }
    }
    m
  }
  override def nullSafeEval(input: Any): Any =
    SketchKernels.tokenSetCounts(input.asInstanceOf[ArrayData], masks, vocabularies.size)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val masksRef = ctx.addReferenceObj("masks", masks, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SketchKernels.tokenSetCounts($a, $masksRef, ${vocabularies.size});")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** array<T> → array<struct<a: T, b: T>> of all index-ordered pairs —
  * the within-bucket candidate-pair generator.
  */
case class OrderedPairs(child: Expression) extends UnaryExpression {
  private lazy val elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("a", elemType), StructField("b", elemType))),
    containsNull = false)
  override def nullSafeEval(input: Any): Any =
    SketchKernels.orderedPairs(input.asInstanceOf[ArrayData], elemType)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val typeRef = ctx.addReferenceObj("elemType", elemType,
      "org.apache.spark.sql.types.DataType")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SketchKernels.orderedPairs($a, $typeRef);")
  }
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: ArrayType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ordered_pairs needs an array argument, got $other")
    }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Streaming ordered-pair generator: array<T> → rows (a: T, b: T) for all
  * i < j, yielded lazily (see HashFunctions.orderedPairsGen). Interpreted
  * generator (CodegenFallback) — the stage it runs in is shuffle-bound, so
  * codegen of the pair loop is immaterial, while NOT materializing the
  * pair array is what keeps hot-bucket memory O(bucket).
  */
case class OrderedPairsGen(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.Generator
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  private lazy val elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType
  override def elementSchema: StructType = StructType(Seq(
    StructField("a", elemType), StructField("b", elemType)))
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): IterableOnce[org.apache.spark.sql.catalyst.InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 2) return Iterator.empty
    // one defensive copy of the members (ArrayData.get may return views
    // into a reused buffer); pairs themselves are never materialized
    val elems = new Array[Any](n)
    var c = 0
    while (c < n) {
      elems(c) = arr.get(c, elemType) match {
        case r: org.apache.spark.sql.catalyst.InternalRow => r.copy()
        case s: UTF8String => s.clone()
        case a: ArrayData => a.copy()
        case x => x
      }
      c += 1
    }
    new Iterator[org.apache.spark.sql.catalyst.InternalRow] {
      private var i = 0
      private var j = 1
      override def hasNext: Boolean = i < n - 1
      override def next(): org.apache.spark.sql.catalyst.InternalRow = {
        val out = org.apache.spark.sql.catalyst.InternalRow(elems(i), elems(j))
        j += 1
        if (j >= n) { i += 1; j = i + 1 }
        out
      }
    }
  }
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: ArrayType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ordered_pairs_gen needs an array argument, got $other")
    }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Lowercase + trim + collapse whitespace runs (see SketchKernels.normalize
  * for the exact `lower()`-parity contract).
  */
case class NormalizeText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    SketchKernels.normalize(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SketchKernels.normalize($a);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** text → array<string> of distinct word k-shingles. */
case class WordShingles(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    SketchKernels.wordShingles(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SketchKernels.wordShingles($a, $k);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** array<string> → array<long> of `numHashes` MinHash slots. */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    SketchKernels.minhash(input.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SketchKernels.minhash($a, $numHashes);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** array<float> → array<int> of one bucket id per LSH table. */
case class HyperplaneBuckets(child: Expression, numTables: Int, numPlanes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    SketchKernels.hyperplaneBuckets(input.asInstanceOf[ArrayData], numTables, numPlanes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SketchKernels.hyperplaneBuckets($a, $numTables, $numPlanes);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** array<string> → 64-bit SimHash. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(SketchKernels.simhash(input.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SketchKernels.simhash($a);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
