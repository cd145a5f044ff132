package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernels behind the native text-hash expressions, shared by the
  * interpreted `nullSafeEval` path and the generated code (the codegen
  * emits a single static call, which keeps the surrounding operators
  * inside whole-stage codegen while the heavy loop runs as plain JVM
  * bytecode the JIT compiles once).
  *
  * PORTABILITY CONTRACT (must match [[TextFunctions.h7]] and the
  * DuckDB oracles bit-for-bit):
  *  - tokens = maximal runs of non-space bytes (split on 0x20 only —
  *    exactly `split(text, " ")` + drop-empties; multibyte UTF-8 never
  *    contains 0x20 so byte-level splitting is exact);
  *  - shingle = n consecutive tokens joined by a single space; a
  *    document with fewer than n tokens collapses to ONE whole-doc
  *    shingle (empty string for an empty doc);
  *  - hash = first 7 md5 hex chars as a long (< 2^28), read straight
  *    off the digest bytes (hex char i is nibble i of the digest);
  *  - MinHash component j = min over shingles of
  *    `(aCoef(j)·h + bCoef(j)) mod P`, P = 2^31-1, initialized to P.
  */
object PortableHash {

  /** Modulus for the MinHash permutation family: 2^31 - 1 (prime).
    * With 28-bit input hashes and coefficients < 2^21 the products stay
    * < 2^49 — exact in BIGINT on every engine, no overflow divergence.
    */
  val MinhashPrime = 2147483647L

  /** j-th permutation coefficients: small odd constants, affinely
    * spread so the permutations are distinct but reproducible in plain
    * SQL (`(a_j * h + b_j) mod p`).
    */
  def aCoef(j: Int): Long = 1000003L + j.toLong * 7919L
  def bCoef(j: Int): Long = 12345L + j.toLong * 104729L

  private val localMd = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 7 hex chars of the digest as a long: hex char i is nibble i,
    * so the value is the top 28 bits of the first 4 digest bytes.
    */
  private def h7FromDigest(d: Array[Byte]): Long =
    ((d(0) & 0xffL) << 20) | ((d(1) & 0xffL) << 12) |
      ((d(2) & 0xffL) << 4) | ((d(3) & 0xffL) >> 4)

  /** Token spans (start offsets, end offsets, count) over the raw
    * UTF-8 bytes. A run of spaces yields no empty tokens, matching
    * `filter(split(text, " "), _ =!= "")`.
    */
  private def tokenSpans(b: Array[Byte]): (Array[Int], Array[Int], Int) = {
    val cap = b.length / 2 + 1
    val starts = new Array[Int](cap)
    val ends = new Array[Int](cap)
    var nt = 0
    var i = 0
    while (i < b.length) {
      if (b(i) != 0x20) {
        starts(nt) = i
        while (i < b.length && b(i) != 0x20) i += 1
        ends(nt) = i
        nt += 1
      } else i += 1
    }
    (starts, ends, nt)
  }

  /** MinHash signature in one pass: digest each shingle once, fold the
    * `numHashes` affine-permutation minima in a primitive loop. Called
    * from generated code — must stay allocation-light.
    */
  def minhash(s: UTF8String, numHashes: Int, n: Int): ArrayData = {
    val bytes = s.getBytes
    val (starts, ends, nt) = tokenSpans(bytes)
    val md = localMd.get()
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, MinhashPrime)

    def hashWindow(from: Int, until: Int): Unit = {
      md.reset()
      var k = from
      while (k < until) {
        if (k > from) md.update(0x20.toByte)
        md.update(bytes, starts(k), ends(k) - starts(k))
        k += 1
      }
      val h = h7FromDigest(md.digest())
      var j = 0
      while (j < numHashes) {
        val p = (aCoef(j) * h + bCoef(j)) % MinhashPrime
        if (p < mins(j)) mins(j) = p
        j += 1
      }
    }

    if (nt >= n) {
      var i = 0
      while (i <= nt - n) { hashWindow(i, i + n); i += 1 }
    } else hashWindow(0, nt)
    new GenericArrayData(mins)
  }

  /** SimHash fingerprint in one pass (Charikar 2002): digest each
    * token once, accumulate the ±1 bit counters in a primitive array,
    * collapse to the bit vector at the end. Bit b is set iff the b-th
    * bits of the token hashes, mapped to ±1, sum strictly positive —
    * exactly [[graft.operators.DedupOps.simhashHof]]'s fold. Repeated
    * tokens count once per occurrence (multiset semantics, like the
    * HOF spec). Empty document → 0L.
    */
  def simhash(s: UTF8String, bits: Int): Long = {
    val bytes = s.getBytes
    val (starts, ends, nt) = tokenSpans(bytes)
    val md = localMd.get()
    val counters = new Array[Int](bits)
    var i = 0
    while (i < nt) {
      md.reset()
      md.update(bytes, starts(i), ends(i) - starts(i))
      val h = h7FromDigest(md.digest())
      var b = 0
      while (b < bits) {
        if (((h >> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (counters(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }

  /** Word n-gram shingles as UTF8Strings. Each shingle's bytes are
    * rebuilt with single-space separators (a raw slice would preserve
    * multi-space runs that `concat_ws` collapses).
    */
  def shingles(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val (starts, ends, nt) = tokenSpans(bytes)

    def joined(from: Int, until: Int): UTF8String = {
      var len = if (until > from) until - from - 1 else 0
      var k = from
      while (k < until) { len += ends(k) - starts(k); k += 1 }
      val out = new Array[Byte](len)
      var pos = 0
      k = from
      while (k < until) {
        if (k > from) { out(pos) = 0x20; pos += 1 }
        val tl = ends(k) - starts(k)
        System.arraycopy(bytes, starts(k), out, pos, tl)
        pos += tl
        k += 1
      }
      UTF8String.fromBytes(out)
    }

    if (nt >= n) {
      val out = new Array[Any](nt - n + 1)
      var i = 0
      while (i <= nt - n) { out(i) = joined(i, i + n); i += 1 }
      new GenericArrayData(out)
    } else {
      new GenericArrayData(Array[Any](joined(0, nt)))
    }
  }

  /** Drop every token covered by a duplicated `window`-token span —
    * the REWRITE kernel of exact-substring dedup (Lee et al. ACL'22,
    * the half [[graft.operators.DedupOps.dupSpans]] only profiles).
    * `starts` is the ASCENDING list of duplicated window START
    * positions (0-based token index, validated — a silent mis-sort
    * would mis-keep tokens); adjacent/overlapping windows union into
    * MAXIMAL covered runs via one two-pointer sweep, so the kept
    * tokens are exactly the complement of the merged spans: O(tokens +
    * spans) per row, never tokens × spans. A whole-doc fallback span
    * (start 0 on a doc shorter than `window`) covers everything.
    */
  def dropSpans(toks: ArrayData, starts: ArrayData, window: Int): ArrayData = {
    val n = toks.numElements()
    val m = starts.numElements()
    if (m == 0) return toks
    // validate the WHOLE array up front (O(spans)): the sweep below
    // only reaches starts <= token count, so an in-sweep check would
    // silently skip a mis-sorted early element that exceeds it —
    // mis-keeping tokens a later (smaller) start should cover
    var v = 0
    var prev = Long.MinValue
    while (v < m) {
      val st = starts.getLong(v)
      if (st < 0L) throw new IllegalArgumentException(
        s"graft_drop_spans: starts must be non-negative (got $st)")
      if (st < prev) throw new IllegalArgumentException(
        s"graft_drop_spans: starts must be ascending (got $st after $prev)")
      prev = st
      v += 1
    }
    val out = new Array[Any](n)
    var cnt = 0
    var si = 0
    var coveredUntil = -1L // exclusive
    var i = 0
    while (i < n) {
      while (si < m && starts.getLong(si) <= i) {
        val e = starts.getLong(si) + window
        if (e > coveredUntil) coveredUntil = e
        si += 1
      }
      if (i >= coveredUntil) { out(cnt) = toks.getUTF8String(i); cnt += 1 }
      i += 1
    }
    if (cnt == n) new GenericArrayData(out)
    else {
      val trimmed = new Array[Any](cnt)
      System.arraycopy(out, 0, trimmed, 0, cnt)
      new GenericArrayData(trimmed)
    }
  }

  /** Shannon character entropy in bits/char — the JVM kernel behind
    * `graft_entropy`, bit-identical to the HOF formulation
    * ([[TextFunctions.charEntropyHof]]) it replaced: terms accumulate
    * over code points in ASCENDING code-point order (= the UTF8String
    * binary order `array_sort` produced), each term is
    * `(-p) · ln(p)` with `p = count/n` in double, and the sum divides
    * by `ln 2` last. Empty text scores 0. The HOF version cost
    * O(distinct × n) interpreted lambda dispatches per row; this is
    * one O(n log distinct) compiled pass.
    */
  def entropy(t: UTF8String): Double = {
    val s = t.toString
    if (s.isEmpty) return 0.0
    val counts = new java.util.TreeMap[Integer, Array[Int]]()
    var i = 0
    var n = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val slot = counts.get(cp)
      if (slot == null) counts.put(cp, Array(1)) else slot(0) += 1
      i += Character.charCount(cp)
      n += 1
    }
    val nd = n.toDouble
    var sum = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next()(0).toDouble / nd
      // StrictMath, not Math: Spark's `log` expression evaluates via
      // StrictMath.log, and the two differ in the last bit often
      // enough (30/500 corpus docs) to break the bit-for-bit contract
      sum += (-p) * java.lang.StrictMath.log(p)
    }
    // the divisor mirrors the HOF's `lit(math.log(2.0))` — a
    // plan-build-time java.lang.Math constant, so Math here is correct
    sum / java.lang.Math.log(2.0)
  }
}

/** Shared shape for the native text-hash expressions: string in,
  * array out, codegen = one static call into [[PortableHash]].
  */
trait PortableHashExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }
}

/** Native MinHash signature — the codegen replacement for the
  * interpreted `aggregate`/`zip_with` fold in
  * [[graft.operators.DedupOps.minhashSignatureHof]] (same output,
  * bit-for-bit; that HOF version and the DuckDB oracle are the
  * executable spec). Registered as `graft_minhash(text, numHashes, n)`
  * by [[graft.GraftExtensions]].
  */
case class MinHashSig(child: Expression, numHashes: Int, n: Int)
    extends PortableHashExpression {

  require(numHashes > 0 && n > 0, "graft_minhash: numHashes and n must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(input: Any): Any =
    PortableHash.minhash(input.asInstanceOf[UTF8String], numHashes, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PortableHash.minhash($c, $numHashes, $n)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Native SimHash fingerprint — codegen replacement for the
  * interpreted `aggregate`/`zip_with` fold in
  * [[graft.operators.DedupOps.simhashHof]] (same output, bit-for-bit;
  * the HOF version and the DuckDB oracle are the executable spec).
  * Registered as `graft_simhash(text, bits)` by
  * [[graft.GraftExtensions]].
  */
case class SimHashExpr(child: Expression, bits: Int)
    extends PortableHashExpression {

  require(bits > 0 && bits <= 28,
    "graft_simhash: bits must be in [1, 28] (the portable hash carries 28 bits)")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any =
    PortableHash.simhash(input.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PortableHash.simhash($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

/** Native word n-gram shingles — codegen replacement for the
  * interpreted `transform`/`sequence` build in
  * [[graft.operators.DedupOps.shinglesHof]]. Registered as
  * `graft_shingles(text, n)` by [[graft.GraftExtensions]].
  */
case class ShinglesExpr(child: Expression, n: Int)
    extends PortableHashExpression {

  require(n > 0, "graft_shingles: n must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(input: Any): Any =
    PortableHash.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PortableHash.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
}

/** Native duplicated-span remover — the per-row rewrite kernel of
  * exact-substring dedup: given the document's tokens and the sorted
  * start positions of its duplicated `window`-token spans, returns the
  * tokens OUTSIDE the merged maximal spans (one linear sweep; a
  * HOF spelling would pay O(tokens × spans) interpreted lambda
  * dispatches on exactly the boilerplate-heavy rows that matter).
  * Registered as `graft_drop_spans(tokens, starts, window)` by
  * [[graft.GraftExtensions]]; composed by
  * [[graft.operators.DedupOps.dropDupSpans]].
  */
case class DropSpansExpr(left: Expression, right: Expression, window: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  require(window >= 1, s"graft_drop_spans: window=$window must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(_: StringType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_drop_spans requires (array<string>, array<bigint>), " +
          s"got (${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_drop_spans"

  override protected def nullSafeEval(t: Any, s: Any): Any =
    PortableHash.dropSpans(t.asInstanceOf[ArrayData],
      s.asInstanceOf[ArrayData], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.PortableHash.dropSpans($a, $b, $window)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DropSpansExpr =
    copy(left = newLeft, right = newRight)
}

/** Native character-entropy — codegen replacement for the interpreted
  * per-distinct-char filter/fold in [[TextFunctions.charEntropyHof]]
  * (same doubles, bit-for-bit; the HOF version and the DuckDB oracle
  * are the executable spec). Registered as `graft_entropy(text)` by
  * [[graft.GraftExtensions]].
  */
case class EntropyExpr(child: Expression) extends PortableHashExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_entropy"

  override protected def nullSafeEval(input: Any): Any =
    PortableHash.entropy(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PortableHash.entropy($c)")

  override protected def withNewChildInternal(newChild: Expression): EntropyExpr =
    copy(child = newChild)
}
