package graft.plans

import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.FuzzyDedup

/** Single-pass native expressions for the text-hashing hot path.
  *
  * The higher-order-function compositions (`transform`/`aggregate` over
  * `split`/`md5`) are semantically identical but interpreted, and Catalyst
  * re-evaluates the non-trivial sub-expressions inside each lambda
  * invocation — `element_at(split(text), i)` re-runs the regex split per
  * element (O(tokens²)) and K minhash permutations re-run md5 K times per
  * shingle. These expressions compute the same values in one pass per row,
  * and generate code (a single static call per row) so the projections and
  * filters around them keep whole-stage codegen instead of falling back to
  * the interpreted path for the entire stage.
  *
  * Semantics are pinned by the DuckDB oracles of q32-q35: same split regex
  * (trailing empties kept, like Spark's `split` with limit -1), same
  * `concat_ws` shingle join, same md5-prefix base hashes.
  */
object TextHash {
  private val Space = Pattern.compile(" +")

  def tokens(s: UTF8String): Array[String] = Space.split(s.toString, -1)

  private val md5Local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private def md5Bytes(s: String): Array[Byte] = {
    val md = md5Local.get()
    md.reset()
    md.digest(s.getBytes("UTF-8"))
  }

  /** H(s): first 8 md5 hex chars as uint32 (= conv(substr(md5,1,8),16,10)) —
    * computed directly from the first 4 digest bytes (big-endian), skipping
    * hex-string formatting/parsing entirely. */
  def baseHash32(s: String): Long = {
    val d = md5Bytes(s)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** H60(s): first 15 md5 hex chars (60 bits) = first 8 bytes big-endian
    * shifted right 4 (dropping the 16th hex digit). */
  def baseHash60(s: String): Long = {
    val d = md5Bytes(s)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** Distinct word-trigrams in first-occurrence order (= the HOF shingles). */
  def shingles(s: UTF8String): Array[String] = {
    val t = tokens(s)
    if (t.length < 3) Array.empty[String]
    else {
      val seen = new java.util.LinkedHashSet[String]()
      var i = 0
      while (i < t.length - 2) {
        seen.add(t(i) + " " + t(i + 1) + " " + t(i + 2))
        i += 1
      }
      seen.toArray(Array.empty[String])
    }
  }

  // ---- static entry points shared by the interpreted and generated paths
  // (the expressions' doGenCode emits ONE static call per row; object
  // TextHash has no companion class, so these get Java static forwarders) --

  /** WordShingles eval body. */
  def shinglesData(s: UTF8String): ArrayData =
    new GenericArrayData(shingles(s).map(UTF8String.fromString))

  /** MinHashBandKeys eval body: K minhashes + banding, md5 once per shingle. */
  def minhashBands(arr: ArrayData): ArrayData = {
    import FuzzyDedup.{BandSize, Coeffs, NumBands, NumHashes, P}
    val n   = arr.numElements()
    val sig = Array.fill(NumHashes)(Long.MaxValue)
    var i   = 0
    while (i < n) {
      val h = baseHash32(arr.getUTF8String(i).toString)
      var j = 0
      while (j < NumHashes) {
        val (a, b) = Coeffs(j)
        val v      = (a * h + b) % P
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    val bands = new Array[UTF8String](NumBands)
    var b = 0
    while (b < NumBands) {
      val sb = new java.lang.StringBuilder()
      sb.append(b)
      var k = 0
      while (k < BandSize) {
        sb.append(':').append(sig(b * BandSize + k))
        k += 1
      }
      bands(b) = UTF8String.fromString(sb.toString)
      b += 1
    }
    new GenericArrayData(bands.asInstanceOf[Array[Any]])
  }

  private val HexDigits = "0123456789abcdef".toCharArray

  private def md5Hex(s: String): String = {
    val d  = md5Bytes(s)
    val sb = new Array[Char](32)
    var i  = 0
    while (i < 16) {
      sb(2 * i) = HexDigits((d(i) >> 4) & 0xf)
      sb(2 * i + 1) = HexDigits(d(i) & 0xf)
      i += 1
    }
    new String(sb)
  }

  /** SpanFingerprints eval body: md5 hex of each non-overlapping
    * `width`-token span (trailing ragged span dropped) — one tokenize +
    * one md5 per span, vs the HOF formulation's per-span slice/concat
    * expression trees. */
  def spanFingerprints(s: UTF8String, width: Int): ArrayData = {
    val t      = tokens(s)
    val nSpans = t.length / width
    val out    = new Array[Any](nSpans)
    val sb     = new java.lang.StringBuilder()
    var j      = 0
    while (j < nSpans) {
      sb.setLength(0)
      var i = j * width
      val e = i + width
      while (i < e) {
        if (i > j * width) sb.append(' ')
        sb.append(t(i))
        i += 1
      }
      out(j) = UTF8String.fromString(md5Hex(sb.toString))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** WinnowMinimizers eval body: q122's minimizer selection in ONE pass —
    * k-gram 60-bit hashes, then the min of each w-hash sliding window via a
    * monotonic deque (amortized O(1) per window, vs the HOF formulation's
    * O(w) `array_min(slice(...))` per window), distinct minimizers in
    * first-window order. Hash = baseHash60("win:" + space-joined k-gram),
    * identical to the fp15/concat_ws HOF chain and the DuckDB oracle.
    * Fewer than w hashes ⇒ the single clipped window selects the global
    * min; fewer than k tokens ⇒ empty sketch. */
  def winnowMinimizers(s: UTF8String, k: Int, w: Int): ArrayData = {
    val t = tokens(s)
    val m = t.length - (k - 1)
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val h  = new Array[Long](m)
    val sb = new java.lang.StringBuilder()
    var i  = 0
    while (i < m) {
      sb.setLength(0)
      sb.append("win:")
      var j = i
      val e = i + k
      while (j < e) {
        if (j > i) sb.append(' ')
        sb.append(t(j))
        j += 1
      }
      h(i) = baseHash60(sb.toString)
      i += 1
    }
    // monotonic deque of indices with increasing hash values; front = the
    // current window's min. >= on push keeps the deque minimal.
    val seen  = new java.util.LinkedHashSet[java.lang.Long]()
    val deque = new java.util.ArrayDeque[Int]()
    def push(idx: Int): Unit = {
      while (!deque.isEmpty && h(deque.peekLast) >= h(idx)) deque.pollLast()
      deque.addLast(idx)
    }
    val firstEnd = math.min(w, m)
    i = 0
    while (i < firstEnd) { push(i); i += 1 }
    seen.add(h(deque.peekFirst))
    var start = 1
    val lastStart = m - w // window starts 1..lastStart all have full width
    while (start <= lastStart) {
      push(start + w - 1)
      if (deque.peekFirst < start) deque.pollFirst()
      seen.add(h(deque.peekFirst))
      start += 1
    }
    val out = new Array[Any](seen.size)
    val it  = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  /** SimHash60 eval body. */
  /** q110's hashed-classifier logit: Σ over unigrams + "_"-joined adjacent
    * bigrams of (fp8(feature) % 17 − 8), one tokenize + one md5 per feature
    * (r18). The HOF formulation (`aggregate` over concat(tokens, bigrams))
    * is CodegenFallback — Spark interprets the lambda per ELEMENT, and the
    * bigram branch re-evaluates `split(text)` via three `element_at`/`size`
    * subtrees per token. Exact parity: baseHash32 IS
    * conv(substr(md5,1,8),16,10); its value is non-negative so `% 17`
    * agrees with Spark's sign-of-dividend remainder; integer addition is
    * order-free. Pinned against the builtin chain by ExpressionParitySpec. */
  def hashedLogit(s: UTF8String): Long = {
    val t   = tokens(s)
    var sum = 0L
    var i   = 0
    while (i < t.length) { sum += baseHash32(t(i)) % 17 - 8; i += 1 }
    i = 0
    while (i + 1 < t.length) { sum += baseHash32(t(i) + "_" + t(i + 1)) % 17 - 8; i += 1 }
    sum
  }

  def simhash60(s: UTF8String): Long = {
    import FuzzyDedup.SimhashBits
    val toks    = tokens(s)
    val balance = new Array[Long](SimhashBits)
    var i = 0
    while (i < toks.length) {
      val h = baseHash60(toks(i))
      var b = 0
      while (b < SimhashBits) {
        if (((h >> b) & 1L) == 1L) balance(b) += 1 else balance(b) -= 1
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b  = 0
    while (b < SimhashBits) {
      if (balance(b) >= 0) fp |= (1L << b)
      b += 1
    }
    fp
  }
}

/** text → ARRAY<STRING> of distinct word-trigram shingles. Generates code
  * (one static call per row) so the surrounding filter/project stays inside
  * whole-stage codegen — a CodegenFallback here would break the span. */
case class WordShingles(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextHash.shinglesData(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextHash.shinglesData($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(newChild)
}

/** shingles → ARRAY<STRING> of LSH band keys "b:sig..:sig..": the K
  * universal-hash minhashes and banding in one pass (md5 once per shingle).
  */
case class MinHashBandKeys(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextHash.minhashBands(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextHash.minhashBands($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(newChild)
}

/** text → ARRAY<STRING> of md5 fingerprints of non-overlapping `width`-token
  * spans (q71). One pass per row inside whole-stage codegen; the HOF
  * formulation rebuilds a slice + concat_ws + md5 expression tree per span,
  * interpreted. */
case class SpanFingerprints(child: Expression, width: Int) extends UnaryExpression {
  require(width > 0, s"span width must be positive, got $width")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextHash.spanFingerprints(input.asInstanceOf[UTF8String], width)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextHash.spanFingerprints($c, $width)")
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** text → ARRAY<LONG> of winnowing minimizers (q122): k-gram hashes +
  * sliding-window min in one pass via a monotonic deque — O(m) total where
  * the HOF formulation pays O(m·w) interpreted lambda evaluations. */
case class WinnowMinimizers(child: Expression, k: Int, w: Int) extends UnaryExpression {
  require(k > 0 && w > 0, s"winnowing needs k > 0 and w > 0, got k=$k w=$w")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextHash.winnowMinimizers(input.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextHash.winnowMinimizers($c, $k, $w)")
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** text → q110 hashed-classifier logit LONG (unigram+bigram hash weights). */
case class HashedLogit(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextHash.hashedLogit(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextHash.hashedLogit($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(newChild)
}

/** text → 60-bit SimHash LONG over the whitespace token multiset. */
case class SimHash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextHash.simhash60(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextHash.simhash60($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(newChild)
}

object TextHashExpressions {
  def wordShingles(text: Column): Column =
    GraftBridge.column(WordShingles(GraftBridge.expression(text)))
  def minhashBandKeys(shingles: Column): Column =
    GraftBridge.column(MinHashBandKeys(GraftBridge.expression(shingles)))
  def simhash60(text: Column): Column =
    GraftBridge.column(SimHash60(GraftBridge.expression(text)))
  def hashedLogit(text: Column): Column =
    GraftBridge.column(HashedLogit(GraftBridge.expression(text)))
  def spanFingerprints(text: Column, width: Int): Column =
    GraftBridge.column(SpanFingerprints(GraftBridge.expression(text), width))
  def winnowMinimizers(text: Column, k: Int, w: Int): Column =
    GraftBridge.column(WinnowMinimizers(GraftBridge.expression(text), k, w))
}
