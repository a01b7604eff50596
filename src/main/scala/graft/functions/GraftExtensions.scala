package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Engine extension point, registered via `spark.sql.extensions` (the
  * public `SparkSessionExtensions` API — SURVEY §7.3's prescribed seam for
  * custom expressions). Currently injects:
  *
  *  - `graft_dot(a, b)` → [[DotProduct]]: native codegen'd float/double
  *    array dot product, the hot scalar of every similarity join.
  *
  * Being a registered function (not a Column helper) also makes the
  * expression available to plain SQL users: `SELECT graft_dot(x, y)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "graft_dot takes exactly 2 arguments")
        DotProduct(children.head, children(1))
      }))
  }
}
