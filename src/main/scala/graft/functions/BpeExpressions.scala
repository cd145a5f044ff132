package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Merge-table BPE (Sennrich, Haddow & Birch, ACL 2016 — public
  * knowledge) over the engine's PORTABLE string contract, so the
  * DuckDB oracle replays both training and encoding bit-for-bit.
  *
  * REPRESENTATION CONTRACT (shared by the JVM kernel, the driver-side
  * trainer in [[graft.operators.BpeOps]], and the SQL replay): a word
  * is the concatenation of `{symbol}` groups — `chat` starts as
  * `{c}{h}{a}{t}` — over NORMALIZED text (lowercase alphanumerics +
  * spaces, [[graft.operators.DedupOps.normalizeText]]), so `{`/`}`
  * can never occur inside a symbol. Applying a merge rule (a, b) is a
  * LITERAL left-to-right non-overlapping replace of `{a}{b}` with
  * `{ab}` — `java.lang.String.replace` and DuckDB `replace()` have
  * identical semantics on this representation, which is the whole
  * point: the scan-merge edge cases (`aaaa` under rule (a,a) →
  * `aa aa`) agree by construction instead of by reimplementation.
  *
  * ENCODING (the `apply_bpe` order): repeatedly find the LOWEST-RANK
  * rule whose `{a}{b}` needle occurs in the word and apply it to all
  * occurrences, until no rule applies — a later merge can expose an
  * earlier-rank pair, hence the restart rather than one ranked pass.
  */
object BpePortable {

  /** `chat` → `{c}{h}{a}{t}` (per UTF-16 char; normalized text is
    * ASCII so chars = code points = DuckDB characters).
    */
  def repr(word: String): String = {
    val sb = new java.lang.StringBuilder(word.length * 3)
    var i = 0
    while (i < word.length) {
      sb.append('{').append(word.charAt(i)).append('}')
      i += 1
    }
    sb.toString
  }

  /** One rule application — the literal replace the contract pins. */
  def applyMerge(repr: String, a: String, b: String): String =
    repr.replace("{" + a + "}{" + b + "}", "{" + a + b + "}")

  /** Full encode of one word against rank-ordered rules; returns the
    * final symbol sequence. `needles(i)`/`repls(i)` are the
    * pre-rendered `{a}{b}` / `{ab}` strings of rank i+1.
    */
  def encodeWord(word: String, needles: Array[String],
                 repls: Array[String]): Array[String] = {
    var r = repr(word)
    var advancing = true
    while (advancing) {
      advancing = false
      var i = 0
      while (i < needles.length && !advancing) {
        if (r.contains(needles(i))) {
          r = r.replace(needles(i), repls(i))
          advancing = true // restart: rank order, lowest applicable first
        }
        i += 1
      }
    }
    if (r.isEmpty) Array.empty
    else r.substring(1, r.length - 1).split("\\}\\{", -1)
  }

  /** Split-on-single-space tokens of normalized text (drop empties —
    * the `tokens` contract).
    */
  def words(text: String): Array[String] =
    text.split(" ", -1).filter(_.nonEmpty)
}

/** Native BPE tokenizer: `graft_bpe(text, merges)` → the document's
  * subword tokens, words encoded independently in order. `merges` is a
  * FOLDABLE array<string> of rank-ordered rules `"a b"` (the trainer's
  * output) — it rides the codegen references table like the codebook
  * expressions, so the generated source is byte-identical across merge
  * tables (no janino recompiles per corpus).
  *
  * CodegenFallback deliberately (the [[CodebookExpression]] rationale):
  * the per-row work is a whole-document encode loop, so one virtual
  * eval dispatch per row is noise, and a per-THREAD word memo makes
  * the amortized cost per row O(new words) — Zipf makes most lookups
  * hits.
  */
case class BpeTokens(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!left.dataType.isInstanceOf[StringType])
      return TypeCheckResult.TypeCheckFailure(
        s"graft_bpe requires a string text argument, got ${left.dataType.catalogString}")
    if (!right.foldable)
      return TypeCheckResult.TypeCheckFailure(
        "graft_bpe merges must be a foldable array<string>")
    right.dataType match {
      case ArrayType(_: StringType, _) =>
        val v = right.eval(null)
        if (v == null) return TypeCheckResult.TypeCheckFailure(
          "graft_bpe merges must not be NULL")
        val a = v.asInstanceOf[ArrayData]
        var i = 0
        while (i < a.numElements()) {
          if (a.isNullAt(i) || a.getUTF8String(i).toString.split(" ", -1).length != 2)
            return TypeCheckResult.TypeCheckFailure(
              s"graft_bpe merge rule $i must be a non-null 'a b' pair")
          i += 1
        }
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_bpe merges must be array<string>, got ${t.catalogString}")
    }
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe"

  // rank-ordered needles/replacements, parsed once per (de)serialized
  // instance from the foldable child
  @transient private lazy val (needles, repls) = {
    val a = right.eval(null).asInstanceOf[ArrayData]
    val ns = new Array[String](a.numElements())
    val rs = new Array[String](a.numElements())
    var i = 0
    while (i < a.numElements()) {
      val Array(x, y) = a.getUTF8String(i).toString.split(" ", -1)
      ns(i) = "{" + x + "}{" + y + "}"
      rs(i) = "{" + x + y + "}"
      i += 1
    }
    (ns, rs)
  }

  // per-thread word memo: encode cost amortizes to O(new words); the
  // size cap bounds executor memory on adversarial vocabularies
  @transient private lazy val memo =
    new ThreadLocal[java.util.HashMap[String, Array[String]]] {
      override def initialValue() = new java.util.HashMap[String, Array[String]]()
    }
  private val MemoCap = 1 << 16

  override protected def nullSafeEval(t: Any, m: Any): Any = {
    val cache = memo.get()
    if (cache.size > MemoCap) cache.clear()
    val out = new java.util.ArrayList[Any]()
    val ws = BpePortable.words(t.asInstanceOf[UTF8String].toString)
    var i = 0
    while (i < ws.length) {
      var toks = cache.get(ws(i))
      if (toks == null) {
        toks = BpePortable.encodeWord(ws(i), needles, repls)
        cache.put(ws(i), toks)
      }
      var j = 0
      while (j < toks.length) { out.add(UTF8String.fromString(toks(j))); j += 1 }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeTokens =
    copy(left = newLeft, right = newRight)
}
