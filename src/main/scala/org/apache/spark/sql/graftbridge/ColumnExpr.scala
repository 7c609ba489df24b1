package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ColumnNodeToExpressionConverter

/** The one `private[sql]` doorway this library uses: convert a public
  * `Column` to its Catalyst `Expression` tree, so graft's manifest
  * file-skipping (`Snapshot.readWhere` → `FileStats.mayMatch`) can
  * pattern-match predicate shapes (=, <, IN, IS NULL, …) instead of
  * parsing SQL text. Spark 4 hides Column internals behind
  * `org.apache.spark.sql.classic` (private[sql]); a bridge object in
  * a `sql` subpackage is the established way external Spark libraries
  * reach them. The EAGER ColumnNode→Expression converter is used (not
  * ExpressionUtils.expression, whose lazy ColumnNodeExpression
  * wrapper hides the tree from pattern matching until analysis).
  * Nothing else from the private surface is touched; the converter
  * itself is pure.
  */
object ColumnExpr {
  def expression(c: Column): Expression =
    ColumnNodeToExpressionConverter(c.node)
}
