package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{LeafExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, JavaCode}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/**
 * A constant ARRAY<DOUBLE> column backed by a TorrentBroadcast handle —
 * the transport for MULTI-MB driver-side constants (PQ codebooks,
 * norm-LUTs, the m·ksub² SDC codeword-dot table).
 *
 * Why not the alternatives, at 100 TB:
 *  - a `typedLit` literal is re-hashed by every Catalyst transform,
 *    duplicated into pushed-down scan filters and every self-join side,
 *    and serialized into EVERY task binary (the round-8 2 MB
 *    TaskSetManager warning at 262k elements);
 *  - a 1-row broadcast-joined LocalRelation keeps the plan clean, but
 *    `BroadcastExchange` materializes its child with a collect JOB, and
 *    `LocalTableScan.doExecute` parallelizes the rows — so the array
 *    still rides ONE task binary per broadcast build (the round-9
 *    finding: the 2100 KiB warning survived the data-join fix).
 * A broadcast HANDLE costs none of that: tasks serialize ~100 bytes,
 * the array ships once per executor over the torrent protocol, and the
 * UnsafeArrayData conversion runs once per task via the transient cache.
 *
 * Non-foldable by construction (constant folding would inline the value
 * back into the plan as a literal, recreating the problem).
 */
case class BroadcastArrayData(bc: Broadcast[Array[Double]]) extends LeafExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def foldable: Boolean = false

  @transient private lazy val cachedArr: UnsafeArrayData =
    UnsafeArrayData.fromPrimitiveArray(bc.value)
  /** Codegen entry point: the converted array, built once per task. */
  def cached: UnsafeArrayData = cachedArr

  override def eval(input: InternalRow): Any = cachedArr

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference THIS expression (a ~100-byte broadcast handle), never the
    // array value — addReferenceObj on the data would serialize it into
    // the task binary, which is exactly the failure mode this class exists
    // to prevent
    val cls = classOf[BroadcastArrayData].getName
    val refTerm = ctx.addReferenceObj("bcArrExpr", this, cls)
    val arrCls = classOf[UnsafeArrayData].getName
    val term = ctx.addMutableState(arrCls, "bcArrData",
      v => s"$v = (($cls) $refTerm).cached();")
    ExprCode.forNonNullValue(JavaCode.global(term, dataType))
  }

  override def prettyName: String = "broadcast_array"
  // never touch bc.value here: plans print on the driver AND in executor
  // logs, and forcing a 2 MB materialization to render a tree node would
  // be its own regression
  override def toString: String = s"broadcast_array(#${bc.id})"
}
