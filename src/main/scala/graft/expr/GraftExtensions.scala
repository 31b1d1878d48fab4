package graft.expr

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.DoubleType

/** Engine extension point (`spark.sql.extensions=graft.expr.GraftExtensions`):
  * registers the engine's native Catalyst expressions as SQL functions so
  * `spark.sql("SELECT ole_to_timestamp(col)")` plans the codegen'd
  * expression directly. Wired into [[graft.core.Sessions.builder]]. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("ole_to_timestamp"),
      new ExpressionInfo(classOf[OleToTimestamp].getName, "ole_to_timestamp"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "ole_to_timestamp expects exactly one argument")
        // implicit numeric widening, since ExpectsInputTypes is sql-private
        OleToTimestamp(Cast(children.head, DoubleType))
      }))
  }
}
