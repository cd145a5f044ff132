package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.DotProductD

/** Session extensions registering graft's native Catalyst expressions,
  * wired via `spark.sql.extensions` in [[Sessions.configure]] — the
  * public, cluster-deployable route (no internal registry APIs; works
  * identically on a real cluster where executors resolve the class
  * from the application jar).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductD].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_dot(a, b) takes exactly 2 arguments")
        DotProductD(children.head, children(1))
      }))
  }
}
