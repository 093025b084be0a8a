package graft.plans

import graft.agg.{CofactorAggregate, TripleCodec}
import graft.ring.Triple
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Planner strategy routing a SQL/DataFrame single-key `GROUP BY` +
 * `sum_to_triple`/`sum_to_nb_agg` through the grouped columnar kernel —
 * the same physical path `Graft.cofactorGrouped` takes (one columnar
 * scan, per-class buffers, executor-side tree merge; measured 0.82× of
 * DuckDB at sf100 vs the exchange + ObjectHashAggregate default). The
 * SQL surface previously always paid the default plan; with this
 * strategy installed, `spark.sql("SELECT k, sum_to_triple(x, y, c) FROM
 * t GROUP BY k")` plans as [[GroupedCofactorKernelExec]] when every
 * gate passes.
 *
 * Opt-in via `spark.experimental.extraStrategies`, the same per-session
 * convention as [[FactorizeCofactorRule]] — NOT registered globally by
 * `Graft.register`, because the library's own row-aggregate parity
 * tests and the bench's row-aggregate measurement rows construct
 * exactly this shape on purpose and must keep planning the default.
 *
 * Gates (any failure returns Nil — the default aggregation plans):
 *  - exactly ONE grouping expression, a plain int/long/string attribute;
 *  - the aggregate list is the group key (possibly aliased) plus exactly
 *    one plain [[CofactorAggregate]] over attribute children (no
 *    DISTINCT, no FILTER);
 *  - child output names are unambiguous (the kernel binds by name);
 *  - [[graft.Graft.groupedKernelGate]] accepts: harvestable bare/
 *    filtered scan, key width/cardinality/buffer-byte caps, and a
 *    probed NULL-row bound ≤ ~10% of the table.
 *
 * NULL-bearing data keeps the fast route via a row-aggregate SIDE
 * CHANNEL: SQL keeps a NULL-key group, and a group whose rows all carry
 * a NULL input still appears with an empty triple — both shapes the
 * kernel's skip-any-NULL-row contract drops. But those are EXACTLY the
 * rows the kernel skips, so the remainder `key IS NULL OR any input IS
 * NULL` is aggregated by the (always-correct) row aggregate — a
 * filter-pushed scan over the small NULL-bearing fraction — and
 * ring-merged with the kernel groups driver-side (`Triple.add`; a
 * NULL-input row contributes nothing to any triple on either path, so
 * the two partitions of the data are disjoint and the merge is exact).
 * Past the gate's ~10% bound the side channel is no longer a remainder
 * and the default plan wins.
 *
 * The probe job runs at PLANNING time (first action or explain); it is
 * fixed-memory, one scan, and memoized per (plan, columns, file
 * snapshot), so repeated queries over the same tables pay it once.
 */
case class GroupedCofactorStrategy(session: SparkSession) extends SparkStrategy {

  def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case agg @ Aggregate(Seq(k: AttributeReference), projList, child, _)
        if projList.count(isPlainCofactor) == 1 &&
          projList.forall(e => isPlainCofactor(e) || isGroupRef(e, k)) =>
      val ae = projList.collectFirst {
        case Alias(a @ AggregateExpression(_: CofactorAggregate, _, false, None, _), _) => a
      }.get
      val cof = ae.aggregateFunction.asInstanceOf[CofactorAggregate]
      // attribute-only children, split by the aggregate's own num/cat
      // rule so the kernel computes the identical triple layout
      if (!cof.children.forall(_.isInstanceOf[AttributeReference])) return Nil
      val keyOk = k.dataType match {
        case org.apache.spark.sql.types.IntegerType | LongType | StringType => true
        case _ => false
      }
      if (!keyOk) return Nil
      // name-unambiguous child: the kernel entry points bind by name
      val names = child.output.map(_.name.toLowerCase(java.util.Locale.ROOT))
      if (names.distinct.size != names.size) return Nil
      val (numAttrs, catAttrs) = cof.children
        .map(_.asInstanceOf[AttributeReference])
        .partition(a => a.dataType match {
          case org.apache.spark.sql.types.DoubleType | org.apache.spark.sql.types.FloatType |
               _: org.apache.spark.sql.types.DecimalType => true
          case _ => false
        })
      val (num, cat) = (numAttrs.map(_.name), catAttrs.map(_.name))
      val df = ColumnBridge.ofRows(session, child)
      graft.Graft.groupedKernelGate(df, k.name, num, cat, cof.nbMode,
          maxGroups = -1, probeNulls = true) match {
        case Some(_) =>
          GroupedCofactorKernelExec(agg.output, projList.map(isPlainCofactor),
            k.name, num, cat, cof.nbMode, k.dataType)(child, session) :: Nil
        case None => Nil
      }
    case _ => Nil
  }

  private def isPlainCofactor(ne: NamedExpression): Boolean = ne match {
    case Alias(AggregateExpression(_: CofactorAggregate, _, false, None, _), _) => true
    case _ => false
  }
  /** The group key itself, bare or aliased (`SELECT k AS g …`). */
  private def isGroupRef(ne: NamedExpression, k: AttributeReference): Boolean = ne match {
    case a: AttributeReference => a.exprId == k.exprId
    case Alias(a: AttributeReference, _) => a.exprId == k.exprId
    case _ => false
  }
}

/**
 * Physical node for the strategy above: at execute time, run the
 * grouped columnar kernel over the child plan (its own columnar scan +
 * executor-side tree merge — the heavy work is fully distributed; only
 * the ≤`maxCategories` kilobyte-sized group triples land on the driver,
 * the same materialization contract as `Graft.cofactorGrouped`), merge
 * in the NULL-remainder side channel when the probe saw NULLs, and
 * return the groups as a single-partition RDD. `tripleSlots(i)` marks
 * which output column carries the triple (the rest is the group key),
 * so any projection order SQL produces is honored.
 */
case class GroupedCofactorKernelExec(
    output: Seq[Attribute], tripleSlots: Seq[Boolean],
    key: String, num: Seq[String], cat: Seq[String], nb: Boolean,
    keyType: DataType)(
    // both transient and OUTSIDE the product: the physical tree is
    // serialized into task closures by parent stages, and a LogicalPlan
    // drags a non-serializable file index along — the kernel only needs
    // them driver-side in doExecute
    @transient private val childLogical: LogicalPlan,
    @transient private val spark: SparkSession) extends LeafExecNode {

  override def otherCopyArgs: Seq[AnyRef] = Seq(childLogical, spark)

  protected override def doExecute(): RDD[InternalRow] = {
    import graft.agg.ColumnarCofactor
    val df = ColumnBridge.ofRows(spark, childLogical)
    // the gate re-runs (memoized probe — no extra scan) so a data
    // rewrite between planning and execution fails loudly instead of
    // silently diverging from SQL semantics
    val (ls, nullUB) = graft.Graft.groupedKernelGate(df, key, num, cat, nb,
        maxGroups = -1, probeNulls = true)
      .getOrElse(throw new IllegalStateException(
        "grouped-cofactor kernel route regressed between planning and execution " +
        "(input rewritten in place?) — re-run the query to re-plan"))
    val groups = ColumnarCofactor.cofactorPerClassLong(df,
        num.map(ColumnarCofactor.NumCol), cat.map(ColumnarCofactor.CatCol), ls, nbMode = nb)
      .getOrElse(throw new IllegalStateException(
        "grouped-cofactor kernel harvest refused a plan the gate accepted"))
    // merge in the ORIGINAL key-value space: kernel keys unpack first,
    // then the side channel's groups ring-add (disjoint row sets — a
    // key in both means a group with clean AND null-bearing rows, whose
    // null-bearing side contributes the empty triple add is identity on)
    val merged = scala.collection.mutable.LinkedHashMap[Any, Triple]()
    groups.foreach { case (kv, t) =>
      val keyVal: Any = keyType match {
        case StringType => ColumnarCofactor.unpackShortString(kv)
        case LongType => kv
        case _ => kv.toInt
      }
      merged(keyVal) = t
    }
    if (nullUB > 0) {
      // the NULL remainder: exactly the rows the kernel skipped. The
      // filter pushes to the scan, so this reads the small NULL-bearing
      // fraction; group count is bounded by the same gate cap.
      val nullCond = ((key +: num) ++ cat).map(c => col(c).isNull).reduce(_ || _)
      val cols = num.map(c => col(c).cast("double")) ++ cat.map(c => col(c).cast("int"))
      val aggCol = if (nb) graft.Graft.sumNbAgg(cols: _*) else graft.Graft.sumTriple(cols: _*)
      df.filter(nullCond).groupBy(col(key)).agg(aggCol.as("__t")).collect().foreach { r =>
        val kAny: Any = if (r.isNullAt(0)) null else r.get(0)
        // an all-skipped group comes back with a NULL triple struct —
        // the empty triple of this arity (the kernel would have dropped
        // the group; SQL keeps it)
        val t = if (r.isNullAt(1)) new graft.agg.CofactorBuffer(num.size, cat.size, nb).toTriple
                else graft.Graft.tripleFromRow(r.getStruct(1))
        merged(kAny) = merged.get(kAny).map(Triple.add(_, t)).getOrElse(t)
      }
    }
    val proj = UnsafeProjection.create(output.map(_.dataType).toArray)
    val rows = merged.iterator.map { case (kAny, t) =>
      val keyVal: Any = kAny match {
        case s: String => UTF8String.fromString(s)
        case other => other // Int / Long / null pass through
      }
      val triple = TripleCodec.toCatalyst(t, nb)
      proj(InternalRow.fromSeq(tripleSlots.map(isT => if (isT) triple else keyVal))).copy()
    }.toSeq
    sparkContext.parallelize(rows, 1)
  }
}
