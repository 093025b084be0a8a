package graft.agg

import graft.ml.{Lda, LinReg, ModelCodec, NaiveBayes, Qda}
import graft.ring.Triple
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * SQL-surface ML functions mirroring the reference's registrations
 * (duckdb_imputation_extension.cpp:184-248), so the reference's SQL
 * workflow runs verbatim modulo dialect:
 *
 *  - `lda_train(triple, label, shrinkage, normalize)` → params
 *  - `lda_predict(params, normalize, features…)` → INT
 *  - `linreg_train(triple, label, step, lambda, max_iters, variance, normalize)` → params
 *  - `linreg_predict(params, add_noise, normalize, features…)` → DOUBLE
 *  - `qda_train(ARRAY<triple>, ARRAY<label>, normalize)` → params
 *  - `qda_predict(params, normalize, features…)` → INT
 *  - `nb_train(ARRAY<triple>, ARRAY<label>)` → params
 *  - `nb_predict(params, normalize, features…)` → INT
 *
 * Params are an opaque ARRAY<DOUBLE> handle ([[ModelCodec]]); the
 * reference's FLOAT[] layout is engine-internal there too, so only the
 * round-trip contract carries over (documented divergence: doubles, so
 * the SQL path predicts exactly like the Scala API). The predict
 * `normalize` flag is accepted for signature parity; graft's codec is
 * self-describing, so it is not needed and ignored. `linreg_train`'s
 * step/max_iters apply to the reference's gradient solver; graft trains
 * with the exact closed-form solve (proven equivalent in MlSpec's
 * GD-parity test), so they are accepted and ignored.
 *
 * Documented divergence — `linreg_predict(…, add_noise=true, …)` draws
 * its N(0, σ̂²) noise from an UNSEEDED ThreadLocalRandom, matching the
 * reference's OS-seeded `regression.cpp:493-504`; the Scala API's
 * `LinReg.predict(addNoise = true, seed = …)` is deterministic via
 * `randn(seed)`. Callers needing reproducible SQL imputation should use
 * the Scala API (or add_noise=false).
 */
object MlSqlFunctions {

  private def evalConst[T](e: Expression, what: String): T = {
    require(e.foldable, s"$what must be a constant")
    e.eval().asInstanceOf[T]
  }
  private def constInt(e: Expression): Int =
    evalConst[Number](e, "argument").intValue()
  private def constDouble(e: Expression): Double =
    evalConst[Number](e, "argument").doubleValue()
  private def constBool(e: Expression): Boolean =
    evalConst[java.lang.Boolean](e, "argument").booleanValue()

  private def tripleOf(v: Any, numFields: Int): Triple =
    TripleCodec.fromCatalyst(v.asInstanceOf[InternalRow], numFields)

  private def checkArity(name: String, children: Seq[Expression], expected: Int,
                         rest: => TypeCheckResult): TypeCheckResult =
    if (children.length != expected)
      TypeCheckResult.TypeCheckFailure(s"$name expects $expected arguments, got ${children.length}")
    else rest

  /** `lda_train(triple, label INT, shrinkage, normalize BOOL)`. */
  case class LdaTrain(children: Seq[Expression]) extends Expression with CodegenFallback {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      checkArity(prettyName, children, 4, children.head.dataType match {
        case s: StructType if s.length == 6 => TypeCheckResult.TypeCheckSuccess
        case dt => TypeCheckResult.TypeCheckFailure(s"lda_train expects a full triple, got $dt")
      })
    override def eval(input: InternalRow): Any = {
      val t = children.head.eval(input)
      if (t == null) return null
      val triple = tripleOf(t, 6)
      if (triple.n == 0) return null // no training rows → no model
      val m = Lda.train(triple, constInt(children(1)),
        constDouble(children(2)), constBool(children(3)))
      new GenericArrayData(ModelCodec.encode(m))
    }
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): LdaTrain = copy(c)
    override def prettyName: String = "lda_train"
  }

  /** `linreg_train(triple, label, step, lambda, max_iters, variance, normalize)`. */
  case class LinRegTrain(children: Seq[Expression]) extends Expression with CodegenFallback {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      checkArity(prettyName, children, 7, children.head.dataType match {
        case s: StructType if s.length == 6 => TypeCheckResult.TypeCheckSuccess
        case dt => TypeCheckResult.TypeCheckFailure(s"linreg_train expects a full triple, got $dt")
      })
    override def eval(input: InternalRow): Any = {
      val t = children.head.eval(input)
      if (t == null) return null
      val triple = tripleOf(t, 6)
      if (triple.n == 0) return null // no training rows → no model
      val m = LinReg.train(triple, constInt(children(1)),
        lambda = constDouble(children(3)),
        computeVariance = constBool(children(5)),
        normalize = constBool(children(6)))
      new GenericArrayData(ModelCodec.encode(m))
    }
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): LinRegTrain = copy(c)
    override def prettyName: String = "linreg_train"
  }

  /** `qda_train(triples ARRAY<triple>, labels ARRAY<INT>, normalize)` /
    * `nb_train(triples ARRAY<triple|nb_agg>, labels ARRAY<INT>)`. */
  case class PerClassTrain(children: Seq[Expression], nb: Boolean)
    extends Expression with CodegenFallback {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult = {
      val arity = if (nb) 2 else 3
      checkArity(prettyName, children, arity, (children.head.dataType, children(1).dataType) match {
        case (ArrayType(s: StructType, _), ArrayType(lt, _))
            if (s.length == 6 || (nb && s.length == 4)) &&
              Seq(IntegerType, LongType, ShortType, ByteType).contains(lt) =>
          TypeCheckResult.TypeCheckSuccess
        case (t, l) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (ARRAY<triple>, ARRAY<integer labels>), got ($t, $l)")
      })
    }
    /** Project a full triple to the NB form: diagonal quad, counts-only
      * categorical maps (what `NaiveBayes.train` consumes). */
    private def toNbForm(t: Triple): Triple =
      if (t.quad.length == t.numCols) t
      else Triple(t.n, t.lin,
        Array.tabulate(t.numCols)(i => t.quad(Triple.triIdx(i, i, t.numCols))),
        t.linCat, Array.empty, Array.empty)
    private lazy val labelType: DataType =
      children(1).dataType.asInstanceOf[ArrayType].elementType
    private def labelAt(a: ArrayData, i: Int): Int = labelType match {
      case IntegerType => a.getInt(i)
      case LongType => a.getLong(i).toInt
      case ShortType => a.getShort(i).toInt
      case ByteType => a.getByte(i).toInt
    }
    override def eval(input: InternalRow): Any = {
      val ts = children.head.eval(input)
      val ls = children(1).eval(input)
      if (ts == null || ls == null) return null
      val numFields = children.head.dataType.asInstanceOf[ArrayType]
        .elementType.asInstanceOf[StructType].length
      val tArr = ts.asInstanceOf[ArrayData]
      val lArr = ls.asInstanceOf[ArrayData]
      require(tArr.numElements() == lArr.numElements(),
        s"$prettyName: ${tArr.numElements()} triples vs ${lArr.numElements()} labels")
      if (tArr.numElements() == 0) return null // no classes → no model
      val perClass = (0 until tArr.numElements()).map { i =>
        // a NULL slot (e.g. a null sum_triple spliced via array(...)) or a
        // NULL label would otherwise NPE / silently train class 0
        require(!tArr.isNullAt(i), s"$prettyName: triples[$i] is NULL")
        require(!lArr.isNullAt(i), s"$prettyName: labels[$i] is NULL")
        val t = tripleOf(tArr.getStruct(i, numFields), numFields)
        labelAt(lArr, i) -> (if (nb) toNbForm(t) else t)
      }
      require(perClass.map(_._1).distinct.length == perClass.length,
        s"$prettyName: duplicate class labels ${perClass.map(_._1).mkString("[", ",", "]")}")
      if (nb) new GenericArrayData(ModelCodec.encode(NaiveBayes.train(perClass)))
      else new GenericArrayData(ModelCodec.encode(Qda.train(perClass, constBool(children(2)))))
    }
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): PerClassTrain =
      copy(children = c)
    override def prettyName: String = if (nb) "nb_train" else "qda_train"
  }

  /** Shared predict: `<kind>_predict(params, flag(s)…, features…)`.
    * `numFlags` leading constant flags after `params` are accepted for
    * reference-signature parity. Features dispatch on type exactly like
    * the aggregates: floating → continuous, integer → categorical. */
  case class MlPredictExpr(children: Seq[Expression], kind: String, numFlags: Int)
    extends Expression with CodegenFallback {

    override def dataType: DataType = if (kind == "linreg") DoubleType else IntegerType
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      if (children.length < 1 + numFlags + 1)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (params, $numFlags flag(s), features…), got ${children.length} arguments")
      else children.head.dataType match {
        case ArrayType(DoubleType, _) =>
          // every feature must be numeric at ANALYSIS time — a STRING or
          // BOOLEAN column would otherwise crash eval with a
          // ClassCastException instead of a clear analysis error
          children.drop(1 + numFlags).map(_.dataType).zipWithIndex.collectFirst {
            case (dt, i) if !dt.isInstanceOf[NumericType] =>
              TypeCheckResult.TypeCheckFailure(
                s"$prettyName: feature ${i + 1} must be numeric, got $dt")
          }.getOrElse(TypeCheckResult.TypeCheckSuccess)
        case dt => TypeCheckResult.TypeCheckFailure(s"${prettyName} expects ARRAY<DOUBLE> params, got $dt")
      }

    private lazy val featureChildren: Array[Expression] =
      children.drop(1 + numFlags).toArray
    private lazy val isNum: Array[Boolean] = featureChildren.map(_.dataType match {
      case DoubleType | FloatType | _: DecimalType => true
      case _ => false
    })
    private lazy val addNoise: Boolean =
      kind == "linreg" && constBool(children(1))

    // decode once per distinct params CONTENT (identity alone never hits
    // for column-valued params: unsafe rows hand out fresh array wrappers
    // per access; a content compare is O(len) with no allocation, far
    // cheaper than re-decoding). (params, model) live in ONE volatile
    // immutable pair so a racing reader can never pair fresh params with
    // a stale model if an expression instance is shared across threads.
    @transient @volatile private var cached: (Array[Double], AnyRef) = _
    private def sameAs(params: Array[Double], a: ArrayData): Boolean = {
      if (a.numElements() != params.length) return false
      var i = 0
      while (i < params.length) {
        if (a.getDouble(i) != params(i)) return false
        i += 1
      }
      true
    }
    private def model(a: ArrayData): AnyRef = {
      val c = cached
      if (c != null && sameAs(c._1, a)) return c._2
      val arr = a.toDoubleArray()
      val m: AnyRef = kind match {
        case "lda" => ModelCodec.decodeLda(arr)
        case "qda" => ModelCodec.decodeQda(arr)
        case "nb" => ModelCodec.decodeNb(arr)
        case "linreg" => ModelCodec.decodeLinReg(arr)
      }
      cached = (arr, m)
      m
    }

    private def checkFeatureCounts(gotNum: Int, gotCat: Int, wantNum: Int, wantCat: Int): Unit =
      if (gotNum != wantNum || gotCat != wantCat)
        throw new IllegalArgumentException(
          s"$prettyName: model expects $wantNum numeric + $wantCat categorical features, " +
          s"got $gotNum numeric + $gotCat categorical")

    override def eval(input: InternalRow): Any = {
      val p = children.head.eval(input)
      if (p == null) return null
      val num = Array.newBuilder[Double]
      val cat = Array.newBuilder[Int]
      var i = 0
      while (i < featureChildren.length) {
        val v = featureChildren(i).eval(input)
        if (v == null) return null
        if (isNum(i)) num += (v match {
          case d: java.lang.Double => d.doubleValue()
          case f: java.lang.Float => f.toDouble
          case d: org.apache.spark.sql.types.Decimal => d.toDouble
        })
        else cat += v.asInstanceOf[Number].intValue()
        i += 1
      }
      val (ns, cs) = (num.result(), cat.result())
      model(p.asInstanceOf[ArrayData]) match {
        case m: Lda.Model =>
          checkFeatureCounts(ns.length, cs.length, m.numCols, m.dict.cols.length)
          java.lang.Integer.valueOf(Lda.predictValue(m, ns, cs))
        case m: Qda.Model =>
          checkFeatureCounts(ns.length, cs.length, m.numCols, m.dict.cols.length)
          java.lang.Integer.valueOf(Qda.predictValue(m, ns, cs))
        case m: NaiveBayes.Model =>
          checkFeatureCounts(ns.length, cs.length, m.numCols,
            m.catFreq.headOption.map(_.length).getOrElse(0))
          java.lang.Integer.valueOf(NaiveBayes.predictValue(m, ns, cs))
        case m: LinReg.Model =>
          checkFeatureCounts(ns.length, cs.length, m.numCoef.length, m.catCoef.length)
          var y = m.intercept
          var j = 0
          while (j < ns.length) { y += m.numCoef(j) * ns(j); j += 1 }
          j = 0
          while (j < cs.length) { y += m.catCoef(j).getOrElse(cs(j), 0.0); j += 1 }
          if (addNoise)
            y += java.util.concurrent.ThreadLocalRandom.current().nextGaussian() *
              math.sqrt(math.max(0.0, m.sigma2))
          java.lang.Double.valueOf(y)
      }
    }
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MlPredictExpr =
      copy(children = c)
    override def prettyName: String = s"${kind}_predict"
  }
}
