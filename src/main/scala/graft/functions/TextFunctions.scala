package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the training-data-pipeline extensions
  * (builder north star; operates on the `documents` table).
  *
  * Everything here is built from codegen'd `org.apache.spark.sql
  * .functions` higher-order/array/string expressions — no UDFs, no
  * shuffles: each document's features are computed per-row inside
  * whole-stage codegen, which is exactly the shape that scales to
  * 100 TB (embarrassingly parallel over the scan).
  *
  * Hashing is PORTABLE by construction: `h7` is the first 7 hex chars
  * of md5 reinterpreted as a long (< 2^28). md5 is identical across
  * engines, so a DuckDB oracle can reproduce every derived feature
  * bit-for-bit — which is what makes MinHash/SimHash/fingerprints
  * oracle-checkable instead of "trust me" operators.
  */
object TextFunctions {

  /** JVM-side twin of [[h7]]: the same "first 7 md5 hex chars as a
    * long" portability contract, for driver/executor Scala code
    * (hyperplane seeds, stub codecs). One definition site — if the
    * width ever changes, Column side and JVM side move together.
    */
  def h7Jvm(bytes: Array[Byte]): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    h7Jvm(bytes, md)
  }

  /** Reusable-digest overload for per-partition loops. */
  def h7Jvm(bytes: Array[Byte], md: java.security.MessageDigest): Long = {
    md.reset()
    val hex = md.digest(bytes).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 7), 16)
  }

  /** Whitespace tokens, empties removed (multi-space safe). */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= lit(""))

  /** Portable 28-bit token hash: md5 prefix as integer. */
  def h7(s: Column): Column =
    conv(substring(md5(s), 1, 7), 16, 10).cast("long")

  /** Document fingerprint: position-weighted rolling hash
    * Σ (i+1)·h7(token_i). Exact integer math (terms < 2^38, sums of
    * ~1e3 tokens < 2^48), so engines agree exactly.
    */
  def fingerprint(text: Column): Column = {
    val weighted = transform(tokens(text), (t, i) => (i + lit(1)).cast("long") * h7(t))
    aggregate(weighted, lit(0L), (acc, x) => acc + x)
  }

  /** Shannon character entropy in bits/char — the cheap gibberish /
    * binary-junk / encoding-noise detector every quality battery
    * carries (natural text sits ~3.5–4.5 bits/char; base64 blobs and
    * key-mash are materially higher, repeated-char padding collapses
    * toward 0). Per-row, shuffle-free: O(distinct·len) char counting
    * inside the scan projection.
    *
    * Determinism: the fold runs over the SORTED distinct characters,
    * so both engines sum the identical term sequence and the double
    * result is bit-identical (unordered distinct would make the
    * float-sum order engine-dependent). Empty/null text scores 0.
    */
  def charEntropy(text: Column): Column =
    call_function("graft_entropy", coalesce(text, lit("")))

  /** [[charEntropy]] expressed purely in built-in higher-order
    * functions — the executable spec the native `graft_entropy` must
    * match bit-for-bit (asserted in TextFunctionsSpec). O(distinct ×
    * n) interpreted lambda dispatches per row (each sorted distinct
    * char re-filters the whole char array), which is why the hot path
    * uses the one-pass compiled kernel instead.
    */
  def charEntropyHof(text: Column): Column = {
    val csRaw = filter(split(coalesce(text, lit("")), ""), c => c =!= lit(""))
    // let-bind the char array (it feeds n, the distinct set, and every
    // per-char count; a Scala val would clone the split per use site)
    element_at(transform(array(csRaw), cs => {
      val n = size(cs).cast("double")
      val terms = transform(array_sort(array_distinct(cs)), c => {
        val p = size(filter(cs, x => x === c)).cast("double") / n
        -p * log(p)
      })
      when(size(cs) === 0, lit(0.0))
        .otherwise(aggregate(terms, lit(0.0), (a, x) => a + x) / lit(math.log(2.0)))
    }), 1)
  }

  /** Rule-based language ID — an n-gram/marker-word heuristic that is
    * deterministic and SQL-expressible (same CASE ladder in the
    * oracle). Real pipelines would swap in fastText etc.; the engine
    * contract is the per-row classify shape, not the model.
    */
  def langId(text: Column): Column = {
    val t = concat(lit(" "), lower(text), lit(" "))
    when(t.contains(" der ") || t.contains(" und ") || t.contains(" nicht "), "de")
      .when(t.contains(" el ") || t.contains(" los ") || t.contains(" una "), "es")
      .when(t.contains(" le ") || t.contains(" et ") || t.contains(" les "), "fr")
      .when(t.contains(" the ") || t.contains(" and "), "en")
      .otherwise("unknown")
  }

  private val stopwords = Seq("the", "a", "and", "of", "to", "in", "is", "it")

  /** Number of whitespace tokens. */
  def nTokens(text: Column): Column = size(tokens(text))

  /** BPE-ish token estimate: alpha runs, digit runs, and single
    * non-space symbols each count as one token.
    */
  def nBpeTokens(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0)))

  /** Stopword ratio over nonempty tokens (null-safe on empty docs). */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    val stops = filter(toks, t => t.isin(stopwords.map(lit(_).cast("string")): _*))
    when(size(toks) === 0, 0.0)
      .otherwise(size(stops).cast("double") / size(toks).cast("double"))
  }

  /** Mean token length in characters. */
  def avgTokenLen(text: Column): Column = {
    val toks = tokens(text)
    val total = aggregate(transform(toks, t => length(t).cast("long")), lit(0L), (a, x) => a + x)
    when(size(toks) === 0, 0.0).otherwise(total.cast("double") / size(toks).cast("double"))
  }

  /** Fraction of characters that are punctuation/symbols. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      (length(text) - length(regexp_replace(text, "[^A-Za-z0-9 ]", ""))).cast("double")
        / length(text).cast("double"))

  /** Intra-document repetition ratio (Gopher/MassiveText-style
    * repetition filter): fraction of word n-grams that are duplicates
    * of an earlier n-gram in the same document,
    * `1 - distinct/total` over the n-gram multiset (0.0 for docs with
    * fewer than n tokens). High values flag boilerplate/spam. Per-row,
    * shuffle-free; the n-gram build rides [[graft.functions
    * .ShinglesExpr]] so tokenization runs once in native code.
    */
  def repetitionRatio(text: Column, n: Int = 2): Column = {
    val grams = call_function("graft_shingles", text, lit(n))
    when(size(tokens(text)) < n, 0.0)
      .otherwise(lit(1.0) -
        size(array_distinct(grams)).cast("double") / size(grams).cast("double"))
  }

  /** Email-address pattern, portable across Java regex and RE2 (no
    * backrefs/lookaround): the pragmatic PII-scrub pattern, not RFC
    * 5322. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Phone-ish pattern: optional +, then 9+ digits allowing dashes
    * between them. Anchored on digits at both ends so trailing
    * punctuation is not consumed; deliberately space-free so the
    * match spans are trivially identical between Java regex and RE2
    * (no greedy-across-separators ambiguity). */
  val PhonePattern = "\\+?[0-9][0-9-]{7,}[0-9]"

  /** PII redaction — the scrub pass every training corpus runs before
    * anything else sees the text: replace email addresses and phone
    * numbers with typed placeholder tags. Emails first (a phone-like
    * digit run inside an email must not be half-replaced), then
    * phones. Pure per-row regexp_replace chain: fuses into the scan
    * projection, no shuffle, and both patterns stay inside the
    * Java-regex ∩ RE2 dialect so a SQL oracle applies the identical
    * automaton.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")

  /** Count of PII hits (emails + phones) in the ORIGINAL text —
    * the audit metric that decides whether a source needs review. */
  def piiCount(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailPattern), lit(0))) +
      size(regexp_extract_all(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        lit(PhonePattern), lit(0)))

  /** Composite quality score in [0,1]: long-enough, low-punctuation,
    * sane stopword density. Deterministic arithmetic over the above.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(500.0), lit(1.0))
    val punctScore = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 5)
    val stopScore = least(stopwordRatio(text) * 4, lit(1.0))
    (lenScore * 0.4 + punctScore * 0.3 + stopScore * 0.3)
  }
}
