package graft.agg

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/**
 * Bounded top-k state: a k-element binary heap whose ROOT is the entry
 * that ranks LAST under the knn ordering `(score DESC NULLS LAST,
 * id ASC)` — i.e. a candidate is admitted by comparing against the
 * current worst, and most candidates are rejected with one double
 * compare against the root. Per-group memory is O(k) regardless of how
 * many candidates stream through, and partial (map-side) aggregation
 * ships one k-heap per group per task instead of every scored pair —
 * the whole point vs a window `row_number`, whose shuffle and sort are
 * O(#pairs) (measured 8.5 s of the 12.7 s sf10 brute-force knn).
 *
 * NULL scores are kept as entries that rank after every non-null score
 * (the window's `DESC` default NULLS LAST), so a group with fewer than
 * k non-null candidates still pads its tail exactly like the window
 * path. NaN ranks above every finite score (Spark's NaN-greatest sort
 * order, matched by `java.lang.Double.compare`); `-0.0` is normalized
 * to `0.0` on entry so zero scores TIE (Spark's sort treats them
 * equal and breaks on id — `Double.compare` alone would rank them).
 * Rows with a NULL id are DROPPED — an id is a key, and this is the
 * one deliberate deviation from the window formulation (Spark's
 * `cId ASC` default is NULLS FIRST, which would let null-id rows
 * consume rank slots); `Similarity.rankTopKWindow` filters null ids
 * for the same contract.
 *
 * Arrays grow geometrically toward k, so a group with few candidates
 * pays for what it holds, not for k.
 */
final class TopKBuffer(val k: Int, cmpId: (Any, Any) => Int) {
  private var cap = math.min(k, 16)
  var score = new Array[Double](cap)
  var isNul = new Array[Boolean](cap)
  var ids = new Array[Any](cap)
  var size = 0

  private def ensureCap(): Unit = if (size == cap && cap < k) {
    cap = math.min(k, cap * 2)
    score = java.util.Arrays.copyOf(score, cap)
    isNul = java.util.Arrays.copyOf(isNul, cap)
    val nids = new Array[Any](cap)
    System.arraycopy(ids, 0, nids, 0, size)
    ids = nids
  }

  /** true iff entry a ranks strictly after entry b (a is worse). */
  private def ranksAfter(ca: Double, na: Boolean, ia: Any,
                         cb: Double, nb: Boolean, ib: Any): Boolean = {
    if (na != nb) na // the null one ranks after
    else if (!na) {
      val c = java.lang.Double.compare(ca, cb)
      if (c != 0) c < 0 else cmpId(ia, ib) > 0
    } else cmpId(ia, ib) > 0
  }

  /** Cheap pre-test without the id in hand: can (c, isNull) possibly
    * displace the current root? `true` may still be rejected by the
    * full tie-break; `false` is always final. */
  def mightAccept(c: Double, isNull: Boolean): Boolean =
    size < k || isNul(0) || (!isNull && java.lang.Double.compare(c, score(0)) >= 0)

  def push(c: Double, isNull: Boolean, id: Any): Unit = {
    if (size < k) {
      ensureCap()
      var i = size
      score(i) = c; isNul(i) = isNull; ids(i) = id
      size += 1
      // sift up: parent must rank after (or equal) its children
      while (i > 0) {
        val p = (i - 1) >> 1
        if (ranksAfter(score(i), isNul(i), ids(i), score(p), isNul(p), ids(p))) {
          swap(i, p); i = p
        } else return
      }
    } else if (ranksAfter(score(0), isNul(0), ids(0), c, isNull, id)) {
      score(0) = c; isNul(0) = isNull; ids(0) = id
      siftDown(0)
    }
  }

  private def swap(i: Int, j: Int): Unit = {
    val c = score(i); score(i) = score(j); score(j) = c
    val n = isNul(i); isNul(i) = isNul(j); isNul(j) = n
    val d = ids(i); ids(i) = ids(j); ids(j) = d
  }

  private def siftDown(i0: Int): Unit = {
    var i = i0
    while (true) {
      val l = 2 * i + 1; val r = l + 1
      var w = i // worst of the triple belongs at the parent
      if (l < size && ranksAfter(score(l), isNul(l), ids(l), score(w), isNul(w), ids(w))) w = l
      if (r < size && ranksAfter(score(r), isNul(r), ids(r), score(w), isNul(w), ids(w))) w = r
      if (w == i) return
      swap(i, w); i = w
    }
  }

  def merge(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.size) { push(other.score(i), other.isNul(i), other.ids(i)); i += 1 }
  }

  /** Entry indices best-first (the window's output order). */
  def sortedIndices(): Array[Int] = {
    val idx = Array.tabulate(size)(identity)
    // size <= k (small); insertion sort under rank order
    var i = 1
    while (i < size) {
      val v = idx(i); var j = i - 1
      while (j >= 0 && ranksAfter(score(idx(j)), isNul(idx(j)), ids(idx(j)),
                                  score(v), isNul(v), ids(v))) {
        idx(j + 1) = idx(j); j -= 1
      }
      idx(j + 1) = v
      i += 1
    }
    idx
  }
}

/**
 * `topk_by_score(score, id, k)` → `ARRAY<STRUCT<cId, cos>>`, the k
 * best entries ordered by `(score DESC NULLS LAST, id ASC)` — the
 * aggregate form of every similarity search's ranking tail. See
 * [[TopKBuffer]] for why this beats a window at scale: the shuffle
 * carries one O(k) heap per (group × task), not every scored pair.
 */
case class TopKByScore(
    scoreChild: Expression,
    idChild: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(scoreChild, idChild)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (k <= 0)
      return TypeCheckResult.TypeCheckFailure(s"topk_by_score: k must be positive, got $k")
    val scoreOk = scoreChild.dataType match {
      case DoubleType | FloatType => true
      case _ => false
    }
    val idOk = idChild.dataType match {
      case LongType | IntegerType | ShortType | ByteType | StringType |
           DoubleType | FloatType | BooleanType | DateType | TimestampType => true
      case _ => false
    }
    if (!scoreOk)
      TypeCheckResult.TypeCheckFailure(
        s"topk_by_score: score must be FLOAT/DOUBLE, got ${scoreChild.dataType}")
    else if (!idOk)
      TypeCheckResult.TypeCheckFailure(
        s"topk_by_score: unsupported id type ${idChild.dataType}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("cId", idChild.dataType, nullable = false),
    StructField("cos", DoubleType, nullable = true))), containsNull = false)
  override def nullable: Boolean = false

  // id comparator matching Spark's ASC sort order for the type
  private lazy val cmpId: (Any, Any) => Int = idChild.dataType match {
    case LongType | TimestampType => (a, b) =>
      java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
    case IntegerType | DateType => (a, b) =>
      java.lang.Integer.compare(a.asInstanceOf[Int], b.asInstanceOf[Int])
    case ShortType => (a, b) => a.asInstanceOf[Short].compareTo(b.asInstanceOf[Short])
    case ByteType => (a, b) => a.asInstanceOf[Byte].compareTo(b.asInstanceOf[Byte])
    case DoubleType => (a, b) =>
      java.lang.Double.compare(a.asInstanceOf[Double], b.asInstanceOf[Double])
    case FloatType => (a, b) =>
      java.lang.Float.compare(a.asInstanceOf[Float], b.asInstanceOf[Float])
    case BooleanType => (a, b) =>
      java.lang.Boolean.compare(a.asInstanceOf[Boolean], b.asInstanceOf[Boolean])
    case StringType => (a, b) =>
      a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String])
  }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k, cmpId)

  // BoundReference fast path for the score (one primitive read + one
  // double compare per candidate on the reject path — the hot loop)
  private lazy val scoreFast: Int = scoreChild match {
    case b: BoundReference if b.dataType == DoubleType => b.ordinal
    case _ => -1
  }
  private lazy val scoreIsFloat = scoreChild.dataType == FloatType

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    var c = 0.0
    var isNull = false
    if (scoreFast >= 0) {
      if (input.isNullAt(scoreFast)) isNull = true else c = input.getDouble(scoreFast)
    } else {
      val v = scoreChild.eval(input)
      if (v == null) isNull = true
      else c = if (scoreIsFloat) v.asInstanceOf[Float].toDouble else v.asInstanceOf[Double]
    }
    c += 0.0 // normalize -0.0: Spark's sort ties it with 0.0, Double.compare would not
    if (!buffer.mightAccept(c, isNull)) return buffer
    val id = idChild.eval(input)
    if (id == null) return buffer // a null id is not rankable; skip the row
    // UTF8String may alias the input row's buffer — copy before keeping;
    // -0.0 ids normalize for the same tie parity as scores
    val kept = id match {
      case s: UTF8String => s.clone()
      case d: java.lang.Double if d.doubleValue == 0.0 => java.lang.Double.valueOf(0.0)
      case f: java.lang.Float if f.floatValue == 0.0f => java.lang.Float.valueOf(0.0f)
      case other => other
    }
    buffer.push(c, isNull, kept)
    buffer
  }

  override def merge(buffer: TopKBuffer, input: TopKBuffer): TopKBuffer = {
    buffer.merge(input); buffer
  }

  override def eval(buffer: TopKBuffer): Any = {
    val idx = buffer.sortedIndices()
    new GenericArrayData(idx.map { i =>
      val row = new GenericInternalRow(2)
      row.update(0, buffer.ids(i))
      if (buffer.isNul(i)) row.setNullAt(1) else row.setDouble(1, buffer.score(i))
      row
    }.toArray[Any])
  }

  private lazy val idIO: (DataOutputStream, Any) => Unit = idChild.dataType match {
    case LongType | TimestampType => (o, v) => o.writeLong(v.asInstanceOf[Long])
    case IntegerType | DateType => (o, v) => o.writeInt(v.asInstanceOf[Int])
    case ShortType => (o, v) => o.writeShort(v.asInstanceOf[Short].toInt)
    case ByteType => (o, v) => o.writeByte(v.asInstanceOf[Byte].toInt)
    case DoubleType => (o, v) => o.writeDouble(v.asInstanceOf[Double])
    case FloatType => (o, v) => o.writeFloat(v.asInstanceOf[Float])
    case BooleanType => (o, v) => o.writeBoolean(v.asInstanceOf[Boolean])
    case StringType => (o, v) =>
      val b = v.asInstanceOf[UTF8String].getBytes
      o.writeInt(b.length); o.write(b)
  }
  private lazy val idRead: DataInputStream => Any = idChild.dataType match {
    case LongType | TimestampType => in => java.lang.Long.valueOf(in.readLong())
    case IntegerType | DateType => in => java.lang.Integer.valueOf(in.readInt())
    case ShortType => in => java.lang.Short.valueOf(in.readShort())
    case ByteType => in => java.lang.Byte.valueOf(in.readByte())
    case DoubleType => in => java.lang.Double.valueOf(in.readDouble())
    case FloatType => in => java.lang.Float.valueOf(in.readFloat())
    case BooleanType => in => java.lang.Boolean.valueOf(in.readBoolean())
    case StringType => in =>
      val b = new Array[Byte](in.readInt()); in.readFully(b); UTF8String.fromBytes(b)
  }

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    var i = 0
    while (i < buffer.size) {
      out.writeDouble(buffer.score(i))
      out.writeBoolean(buffer.isNul(i))
      idIO(out, buffer.ids(i))
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val c = in.readDouble(); val nul = in.readBoolean(); val id = idRead(in)
      b.push(c, nul, id)
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(scoreChild = newChildren(0), idChild = newChildren(1))
  override def prettyName: String = "topk_by_score"
}
