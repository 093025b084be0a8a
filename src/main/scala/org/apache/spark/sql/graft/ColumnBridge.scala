package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column↔Expression converters — the one
  * place graft needs a Column wrapping a custom Expression that cannot
  * be built through `call_function` (a
  * [[graft.functions.BroadcastArrayData]] carries a live Broadcast
  * handle, which has no literal/child-expression encoding). Lives in an
  * `org.apache.spark.sql` subpackage solely for access; keep it to the
  * two pass-throughs below. */
object ColumnBridge {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
