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

  /** `lda_train(triple, label INT, shrinkage, normalize BOOL)`. */
  case class LdaTrain(children: Seq[Expression]) extends Expression with CodegenFallback {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult = children.head.dataType match {
      case s: StructType if s.length == 6 => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(s"lda_train expects a full triple, got $dt")
    }
    override def eval(input: InternalRow): Any = {
      val t = children.head.eval(input)
      if (t == null) return null
      val m = Lda.train(tripleOf(t, 6), constInt(children(1)),
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
    override def checkInputDataTypes(): TypeCheckResult = children.head.dataType match {
      case s: StructType if s.length == 6 => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(s"linreg_train expects a full triple, got $dt")
    }
    override def eval(input: InternalRow): Any = {
      val t = children.head.eval(input)
      if (t == null) return null
      val m = LinReg.train(tripleOf(t, 6), constInt(children(1)),
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
    override def checkInputDataTypes(): TypeCheckResult = children.head.dataType match {
      case ArrayType(s: StructType, _) if s.length == 6 || (nb && s.length == 4) =>
        TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(s"$prettyName expects ARRAY of triples, got $dt")
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
      val perClass = (0 until tArr.numElements()).map(i =>
        lArr.getInt(i) -> tripleOf(tArr.getStruct(i, numFields), numFields))
      if (nb) new GenericArrayData(ModelCodec.encode(NaiveBayes.train(perClass)))
      else {
        val normalize = if (children.length > 2) constBool(children(2)) else false
        new GenericArrayData(ModelCodec.encode(Qda.train(perClass, normalize)))
      }
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
    override def checkInputDataTypes(): TypeCheckResult = children.head.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(s"${prettyName} expects ARRAY<DOUBLE> params, got $dt")
    }

    private lazy val featureChildren = children.drop(1 + numFlags)
    private lazy val isNum: Array[Boolean] = featureChildren.map(_.dataType match {
      case DoubleType | FloatType | _: DecimalType => true
      case _ => false
    }).toArray
    private lazy val addNoise: Boolean =
      kind == "linreg" && constBool(children(1))

    // decode once per identical params value (the common case: a literal
    // or broadcast params array evaluates to the same instance per row)
    @transient private var cachedKey: AnyRef = _
    @transient private var cachedModel: AnyRef = _
    private def model(paramsRaw: AnyRef): AnyRef = {
      if (!(paramsRaw eq cachedKey)) {
        val arr = paramsRaw.asInstanceOf[ArrayData].toDoubleArray()
        cachedModel = kind match {
          case "lda" => ModelCodec.decodeLda(arr)
          case "qda" => ModelCodec.decodeQda(arr)
          case "nb" => ModelCodec.decodeNb(arr)
          case "linreg" => ModelCodec.decodeLinReg(arr)
        }
        cachedKey = paramsRaw
      }
      cachedModel
    }

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
      model(p.asInstanceOf[AnyRef]) match {
        case m: Lda.Model => java.lang.Integer.valueOf(Lda.predictValue(m, ns, cs))
        case m: Qda.Model => java.lang.Integer.valueOf(Qda.predictValue(m, ns, cs))
        case m: NaiveBayes.Model => java.lang.Integer.valueOf(NaiveBayes.predictValue(m, ns, cs))
        case m: LinReg.Model =>
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
