package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{AdcTable, BpeTokens, CellTopN, DotProductD, DropSpansExpr, EntropyExpr, HilbertIndex, HilbertIndexN, MinHashSig, PqEncode, ShinglesExpr, SimHashExpr}

/** Session extensions registering graft's native Catalyst expressions,
  * wired via `spark.sql.extensions` in [[Sessions.configure]] — the
  * public, cluster-deployable route (no internal registry APIs; works
  * identically on a real cluster where executors resolve the class
  * from the application jar).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Hyper-parameters (signature width, shingle size) are baked into
    * the expression instance at resolution time, so they must be
    * integer literals in the call.
    */
  private def litInt(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductD].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_dot(a, b) takes exactly 2 arguments")
        DotProductD(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_hilbert"),
      new ExpressionInfo(classOf[HilbertIndex].getName, "graft_hilbert"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "graft_hilbert(x, y, bits) takes exactly 3 arguments")
        HilbertIndex(children.head, children(1),
          litInt(children(2), "graft_hilbert", "bits"))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_hilbert_n"),
      new ExpressionInfo(classOf[HilbertIndexN].getName, "graft_hilbert_n"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_hilbert_n(coords, bits) takes exactly 2 arguments")
        HilbertIndexN(children.head,
          litInt(children(1), "graft_hilbert_n", "bits"))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_drop_spans"),
      new ExpressionInfo(classOf[DropSpansExpr].getName, "graft_drop_spans"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "graft_drop_spans(tokens, starts, window) takes exactly 3 arguments")
        DropSpansExpr(children.head, children(1),
          litInt(children(2), "graft_drop_spans", "window"))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_bpe"),
      new ExpressionInfo(classOf[BpeTokens].getName, "graft_bpe"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_bpe(text, merges) takes exactly 2 arguments")
        BpeTokens(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "graft_minhash(text, numHashes, n) takes exactly 3 arguments")
        MinHashSig(children.head,
          litInt(children(1), "graft_minhash", "numHashes"),
          litInt(children(2), "graft_minhash", "n"))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHashExpr].getName, "graft_simhash"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_simhash(text, bits) takes exactly 2 arguments")
        SimHashExpr(children.head, litInt(children(1), "graft_simhash", "bits"))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[ShinglesExpr].getName, "graft_shingles"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_shingles(text, n) takes exactly 2 arguments")
        ShinglesExpr(children.head, litInt(children(1), "graft_shingles", "n"))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_entropy"),
      new ExpressionInfo(classOf[EntropyExpr].getName, "graft_entropy"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          "graft_entropy(text) takes exactly 1 argument")
        EntropyExpr(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_cell_topn"),
      new ExpressionInfo(classOf[CellTopN].getName, "graft_cell_topn"),
      (children: Seq[Expression]) => {
        require(children.length == 5,
          "graft_cell_topn(vec, nrm, centsFlat, centNrms, n) takes exactly 5 arguments")
        CellTopN(children.head, children(1), children(2), children(3),
          litInt(children(4), "graft_cell_topn", "n"))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_pq_encode"),
      new ExpressionInfo(classOf[PqEncode].getName, "graft_pq_encode"),
      (children: Seq[Expression]) => {
        require(children.length == 4,
          "graft_pq_encode(vec, cbFlat, m, ksub) takes exactly 4 arguments")
        PqEncode(children.head, children(1),
          litInt(children(2), "graft_pq_encode", "m"),
          litInt(children(3), "graft_pq_encode", "ksub"))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_adc"),
      new ExpressionInfo(classOf[AdcTable].getName, "graft_adc"),
      (children: Seq[Expression]) => {
        require(children.length == 4,
          "graft_adc(vec, cbFlat, m, ksub) takes exactly 4 arguments")
        AdcTable(children.head, children(1),
          litInt(children(2), "graft_adc", "m"),
          litInt(children(3), "graft_adc", "ksub"))
      }))
  }
}
