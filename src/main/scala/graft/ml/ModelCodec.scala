package graft.ml

/**
 * Flat numeric parameter encoding for trained models — the SQL-surface
 * counterpart of the reference's self-describing FLOAT[] model values
 * (`lda_train` → `lda_predict` round-trip, ML/lda.cpp:335-386,
 * regression.cpp:313-353). Users treat the array as an opaque handle
 * (train output spliced into predict input), so graft uses its own
 * layout — and DOUBLE elements instead of the reference's FLOAT, so the
 * SQL path predicts bit-identically to the Scala API.
 *
 * Layout conventions: a kind tag first, then dimensions, then the
 * categorical dictionary (per column: count + sorted category values),
 * then the dense parameter blocks.
 */
object ModelCodec {

  val KIND_LINREG = 1.0
  val KIND_LDA = 2.0
  val KIND_QDA = 3.0
  val KIND_NB = 4.0

  private final class W {
    val b = Array.newBuilder[Double]
    def +=(d: Double): this.type = { b += d; this }
    def ++=(a: Array[Double]): this.type = { b ++= a; this }
    def int(i: Int): this.type = { b += i.toDouble; this }
    def result(): Array[Double] = b.result()
  }

  private final class R(a: Array[Double]) {
    private var p = 0
    def d(): Double = { val v = a(p); p += 1; v }
    def int(): Int = d().toInt
    def arr(n: Int): Array[Double] = { val v = a.slice(p, p + n); p += n; v }
  }

  private def writeDict(w: W, dict: CatDict): Unit = {
    w.int(dict.cols.length)
    dict.cols.foreach(w.int)
    dict.cats.foreach { cs => w.int(cs.length); cs.foreach(w.int) }
  }

  private def readDict(r: R): CatDict = {
    val nCols = r.int()
    val cols = Array.fill(nCols)(r.int())
    val cats = Array.fill(nCols) { val n = r.int(); Array.fill(n)(r.int()) }
    val offsets = cats.scanLeft(0)(_ + _.length)
    CatDict(cols, cats, offsets.dropRight(1), offsets.last)
  }

  // ---- LinReg ----

  def encode(m: LinReg.Model): Array[Double] = {
    val w = new W
    w += KIND_LINREG
    w += m.intercept
    w.int(m.numCoef.length); w ++= m.numCoef
    w.int(m.catCoef.length)
    m.catCoef.foreach { cm =>
      w.int(cm.size)
      cm.toSeq.sortBy(_._1).foreach { case (k, v) => w.int(k); w += v }
    }
    w += m.sigma2
    w.result()
  }

  /** n (key, value) pairs in stream order; Array.fill evaluates its
    * element expression left-to-right n times. */
  private def readMap(r: R): Map[Int, Double] =
    Array.fill(r.int())(r.int() -> r.d()).toMap

  def decodeLinReg(a: Array[Double]): LinReg.Model = {
    val r = new R(a)
    require(r.d() == KIND_LINREG, "params are not a linreg model")
    val icpt = r.d()
    val numCoef = r.arr(r.int())
    val catCoef = Array.fill(r.int())(readMap(r))
    LinReg.Model(icpt, numCoef, catCoef, r.d())
  }

  // ---- LDA ----

  def encode(m: Lda.Model): Array[Double] = {
    val w = new W
    w += KIND_LDA
    w.int(m.numCols)
    writeDict(w, m.dict)
    w.int(m.classes.length)
    m.classes.foreach(w.int)
    m.coef.foreach(w ++= _)
    w ++= m.intercepts
    w.result()
  }

  def decodeLda(a: Array[Double]): Lda.Model = {
    val r = new R(a)
    require(r.d() == KIND_LDA, "params are not an lda model")
    val numCols = r.int()
    val dict = readDict(r)
    val k = r.int()
    val classes = Array.fill(k)(r.int())
    val dim = numCols + dict.dim
    val coef = Array.fill(k)(r.arr(dim))
    Lda.Model(classes, coef, r.arr(k), numCols, dict)
  }

  // ---- QDA ----

  def encode(m: Qda.Model): Array[Double] = {
    val w = new W
    w += KIND_QDA
    w.int(m.numCols)
    writeDict(w, m.dict)
    w.int(m.classes.length)
    m.classes.foreach(w.int)
    m.quad.foreach(w ++= _)
    m.linear.foreach(w ++= _)
    w ++= m.consts
    w.result()
  }

  def decodeQda(a: Array[Double]): Qda.Model = {
    val r = new R(a)
    require(r.d() == KIND_QDA, "params are not a qda model")
    val numCols = r.int()
    val dict = readDict(r)
    val k = r.int()
    val classes = Array.fill(k)(r.int())
    val dim = numCols + dict.dim
    val quad = Array.fill(k)(r.arr(dim * dim))
    val linear = Array.fill(k)(r.arr(dim))
    Qda.Model(classes, quad, linear, r.arr(k), numCols, dict)
  }

  // ---- NB ----

  def encode(m: NaiveBayes.Model): Array[Double] = {
    val w = new W
    w += KIND_NB
    val numCols = m.numCols
    val nCat = m.catFreq.headOption.map(_.length).getOrElse(0)
    w.int(numCols); w.int(nCat)
    w.int(m.classes.length)
    m.classes.foreach(w.int)
    w ++= m.priors
    m.means.foreach(w ++= _)
    m.vars.foreach(w ++= _)
    m.catFreq.foreach { perCol =>
      perCol.foreach { cm =>
        w.int(cm.size)
        cm.toSeq.sortBy(_._1).foreach { case (k, v) => w.int(k); w += v }
      }
    }
    w.result()
  }

  def decodeNb(a: Array[Double]): NaiveBayes.Model = {
    val r = new R(a)
    require(r.d() == KIND_NB, "params are not an nb model")
    val numCols = r.int(); val nCat = r.int()
    val k = r.int()
    val classes = Array.fill(k)(r.int())
    val priors = r.arr(k)
    val means = Array.fill(k)(r.arr(numCols))
    val vars = Array.fill(k)(r.arr(numCols))
    val catFreq = Array.fill(k)(Array.fill(nCat)(readMap(r)))
    NaiveBayes.Model(classes, priors, means, vars, catFreq)
  }
}
