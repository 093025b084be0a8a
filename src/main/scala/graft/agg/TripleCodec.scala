package graft.agg

import graft.ring.Triple
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types._

/**
 * Catalyst <-> [[Triple]] conversion. The SQL-visible triple type is
 *
 * {{{
 * STRUCT(n BIGINT,
 *        lin  ARRAY<DOUBLE>,
 *        quad ARRAY<DOUBLE>,                       -- packed upper triangle (diag only for NB)
 *        lin_cat      ARRAY<MAP<INT, DOUBLE>>,
 *        quad_num_cat ARRAY<MAP<INT, DOUBLE>>,     -- absent in NB form
 *        quad_cat     ARRAY<MAP<BIGINT, DOUBLE>>)  -- key = (c1 << 32) | c2; absent in NB form
 * }}}
 *
 * mirroring the reference's LIST/STRUCT layout (triple/sum/sum.cpp:26-52)
 * with map-typed categorical fields (idiomatic Spark encoding of the same
 * content). Map entries are emitted in sorted key order, matching the
 * reference's std::map iteration (sum_state.cpp:116-464).
 */
object TripleCodec {

  val intMap: MapType = MapType(IntegerType, DoubleType, valueContainsNull = false)
  val longMap: MapType = MapType(LongType, DoubleType, valueContainsNull = false)

  val fullType: StructType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("lin", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("quad", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("lin_cat", ArrayType(intMap, containsNull = false), nullable = false),
    StructField("quad_num_cat", ArrayType(intMap, containsNull = false), nullable = false),
    StructField("quad_cat", ArrayType(longMap, containsNull = false), nullable = false)
  ))

  val nbType: StructType = StructType(fullType.fields.take(4))

  def dataType(nb: Boolean): StructType = if (nb) nbType else fullType

  private def intMapData(m: Map[Int, Double]): MapData = {
    val ks = m.keys.toArray.sorted
    new ArrayBasedMapData(new GenericArrayData(ks), new GenericArrayData(ks.map(m)))
  }
  private def longMapData(m: Map[Long, Double]): MapData = {
    val ks = m.keys.toArray.sorted
    new ArrayBasedMapData(new GenericArrayData(ks), new GenericArrayData(ks.map(m)))
  }

  def toCatalyst(t: Triple, nb: Boolean): InternalRow = {
    val fields = new Array[Any](if (nb) 4 else 6)
    fields(0) = t.n
    // + 0.0 normalizes -0.0 so output hashes deterministically
    fields(1) = new GenericArrayData(t.lin.map(d => java.lang.Double.valueOf(d + 0.0)): Array[Any])
    fields(2) = new GenericArrayData(t.quad.map(d => java.lang.Double.valueOf(d + 0.0)): Array[Any])
    fields(3) = new GenericArrayData(t.linCat.map(intMapData): Array[Any])
    if (!nb) {
      fields(4) = new GenericArrayData(t.quadNumCat.map(intMapData): Array[Any])
      fields(5) = new GenericArrayData(t.quadCat.map(longMapData): Array[Any])
    }
    new GenericInternalRow(fields)
  }

  private def readIntMaps(a: ArrayData): Array[Map[Int, Double]] =
    Array.tabulate(a.numElements()) { i =>
      val m = a.getMap(i)
      val ks = m.keyArray(); val vs = m.valueArray()
      val b = Map.newBuilder[Int, Double]
      var j = 0
      while (j < m.numElements()) { b += ks.getInt(j) -> vs.getDouble(j); j += 1 }
      b.result()
    }

  private def readLongMaps(a: ArrayData): Array[Map[Long, Double]] =
    Array.tabulate(a.numElements()) { i =>
      val m = a.getMap(i)
      val ks = m.keyArray(); val vs = m.valueArray()
      // TreeMap: diagonal packed keys all share Long.hashCode 0, so even
      // BUILDING a HashMap from a big quad_cat map is O(m²)
      val b = scala.collection.immutable.TreeMap.newBuilder[Long, Double]
      var j = 0
      while (j < m.numElements()) { b += ks.getLong(j) -> vs.getDouble(j); j += 1 }
      b.result()
    }

  /** Decode a triple struct; handles both the 6-field full form and the
    * 4-field NB form (cf. extract_data, ML/utils.cpp:72). */
  def fromCatalyst(row: InternalRow, numFields: Int): Triple = {
    val nb = numFields == 4
    Triple(
      row.getLong(0),
      row.getArray(1).toDoubleArray(),
      row.getArray(2).toDoubleArray(),
      readIntMaps(row.getArray(3)),
      if (nb) Array.empty else readIntMaps(row.getArray(4)),
      if (nb) Array.empty else readLongMaps(row.getArray(5))
    )
  }

  // ---- compact binary form (aggregation-buffer spill / shuffle) ----

  def write(t: Triple, out: java.io.DataOutputStream): Unit = {
    out.writeLong(t.n)
    out.writeInt(t.numCols); out.writeInt(t.catCols); out.writeInt(t.quad.length)
    t.lin.foreach(out.writeDouble); t.quad.foreach(out.writeDouble)
    out.writeInt(t.quadNumCat.length); out.writeInt(t.quadCat.length)
    def wi(m: Map[Int, Double]): Unit = {
      out.writeInt(m.size); m.foreach { case (k, v) => out.writeInt(k); out.writeDouble(v) }
    }
    def wl(m: Map[Long, Double]): Unit = {
      out.writeInt(m.size); m.foreach { case (k, v) => out.writeLong(k); out.writeDouble(v) }
    }
    t.linCat.foreach(wi); t.quadNumCat.foreach(wi); t.quadCat.foreach(wl)
  }

  /** Buffer-direct binary form: serialize the mutable aggregation state
    * as-is (LongMap slot arrays), skipping the per-flush `toTriple` /
    * immutable-Map materialization — this runs once per key per
    * partial-aggregate flush, so grouped cofactors over high-cardinality
    * keys live on this path. Only ever read back by [[readBuffer]]. */
  def writeBuffer(b: CofactorBuffer, out: java.io.DataOutputStream): Unit = {
    out.writeLong(b.n)
    out.writeInt(b.numCols); out.writeInt(b.catCols)
    var i = 0
    while (i < b.lin.length) { out.writeDouble(b.lin(i)); i += 1 }
    i = 0
    while (i < b.quad.length) { out.writeDouble(b.quad(i)); i += 1 }
    val catSlots = if (b.nbMode) 1 else b.numCols + 1
    var j = 0
    while (j < b.catMaps.length) {
      val m = b.catMaps(j)
      out.writeInt(m.size)
      m.foreach { case (k, v) =>
        out.writeLong(k)
        var s = 0
        while (s < catSlots) { out.writeDouble(v(s)); s += 1 }
      }
      j += 1
    }
    j = 0
    while (j < b.quadCat.length) {
      val m = b.quadCat(j)
      out.writeInt(m.size)
      m.foreach { case (k, v) => out.writeLong(k); out.writeDouble(v(0)) }
      j += 1
    }
  }

  def readBuffer(in: java.io.DataInputStream, nbMode: Boolean): CofactorBuffer = {
    val n = in.readLong()
    val numCols = in.readInt(); val catCols = in.readInt()
    val b = new CofactorBuffer(numCols, catCols, nbMode)
    b.n = n
    var i = 0
    while (i < b.lin.length) { b.lin(i) = in.readDouble(); i += 1 }
    i = 0
    while (i < b.quad.length) { b.quad(i) = in.readDouble(); i += 1 }
    val catSlots = if (nbMode) 1 else numCols + 1
    var j = 0
    while (j < catCols) {
      val sz = in.readInt()
      val m = b.catMaps(j)
      var e = 0
      while (e < sz) {
        val k = in.readLong()
        val v = new Array[Double](catSlots)
        var s = 0
        while (s < catSlots) { v(s) = in.readDouble(); s += 1 }
        m.put(k, v)
        e += 1
      }
      j += 1
    }
    j = 0
    while (j < b.quadCat.length) {
      val sz = in.readInt()
      val m = b.quadCat(j)
      var e = 0
      while (e < sz) { m.put(in.readLong(), Array(in.readDouble())); e += 1 }
      j += 1
    }
    b
  }

  def read(in: java.io.DataInputStream): Triple = {
    val n = in.readLong()
    val nc = in.readInt(); val cc = in.readInt(); val ql = in.readInt()
    val lin = Array.fill(nc)(in.readDouble()); val quad = Array.fill(ql)(in.readDouble())
    val nqnc = in.readInt(); val nqc = in.readInt()
    def ri(): Map[Int, Double] = {
      val s = in.readInt(); val b = Map.newBuilder[Int, Double]
      var i = 0; while (i < s) { b += in.readInt() -> in.readDouble(); i += 1 }; b.result()
    }
    def rl(): Map[Long, Double] = { // TreeMap: see readLongMaps
      val s = in.readInt(); val b = scala.collection.immutable.TreeMap.newBuilder[Long, Double]
      var i = 0; while (i < s) { b += in.readLong() -> in.readDouble(); i += 1 }; b.result()
    }
    Triple(n, lin, quad, Array.fill(cc)(ri()), Array.fill(nqnc)(ri()), Array.fill(nqc)(rl()))
  }
}
