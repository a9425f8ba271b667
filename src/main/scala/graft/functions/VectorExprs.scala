package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector math for similarity search. The HOF formulations
  * (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) are interpreted — one
  * expression-tree walk per element — which dominates ANN runtime. These
  * evaluate in compiled loops with IDENTICAL IEEE semantics: left-to-right
  * sequential summation, so results are bit-equal to the sequential-fold
  * HOF versions (and to DuckDB's list_dot_product loop).
  */
object VectorExprs {

  /** cosine(a, b) over two array<double> in one pass (dot, |a|, |b|).
    * Null (not an error) when either norm is zero, matching try_divide. */
  case class CosineSim(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "cosine_sim"
    override def nullable: Boolean = true

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0.0
      var nx = 0.0
      var ny = 0.0
      var i = 0
      while (i < n) {
        val xi = x.getDouble(i)
        val yi = y.getDouble(i)
        dot += xi * yi
        nx += xi * xi
        ny += yi * yi
        i += 1
      }
      val denom = math.sqrt(nx) * math.sqrt(ny)
      if (denom == 0.0) null else dot / denom
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
      copy(left = l, right = r)
  }

  /** Random-hyperplane LSH signatures: for each table t, a long whose bit b
    * is the sign of v · planes(t)(b). One compiled pass over all
    * tables × bits × dims; input array<double>, output array<long> of
    * length `tables`. */
  case class HyperplaneSigs(child: Expression, planes: Array[Array[Array[Double]]])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "hyperplane_sigs"

    override protected def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val dim = v.numElements()
      val out = new Array[Long](planes.length)
      var t = 0
      while (t < planes.length) {
        val table = planes(t)
        var sig = 0L
        var b = 0
        while (b < table.length) {
          val plane = table(b)
          val d = math.min(dim, plane.length)
          var proj = 0.0
          var i = 0
          while (i < d) {
            proj += v.getDouble(i) * plane(i)
            i += 1
          }
          if (proj >= 0) sig |= (1L << b)
          b += 1
        }
        out(t) = sig
        t += 1
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
    }

    override protected def withNewChildInternal(newChild: Expression): HyperplaneSigs =
      copy(child = newChild)
  }

  /** The `nprobe` nearest centroids of `v` by cosine, most-similar first
    * (ties → lowest centroid index). One compiled pass over centroids ×
    * dims; input array<double>, output array<int> of length
    * min(nprobe, #centroids). The IVF coarse quantizer: corpus rows use
    * nprobe=1 (their cell), queries probe several. */
  case class NearestCentroids(child: Expression, centroids: Array[Array[Double]], nprobe: Int)
      extends UnaryExpression with CodegenFallback {
    require(nprobe > 0)
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "nearest_centroids"

    // centroid norms are data-independent — precompute once per expression
    @transient private lazy val norms: Array[Double] = centroids.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      math.sqrt(s)
    }

    override protected def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val dim = v.numElements()
      val vec = new Array[Double](dim)
      var i = 0
      while (i < dim) { vec(i) = v.getDouble(i); i += 1 }
      var vn = 0.0
      i = 0
      while (i < dim) { vn += vec(i) * vec(i); i += 1 }
      vn = math.sqrt(vn)
      val sims = new Array[Double](centroids.length)
      var c = 0
      while (c < centroids.length) {
        val cent = centroids(c)
        val d = math.min(dim, cent.length)
        var dot = 0.0
        i = 0
        while (i < d) { dot += vec(i) * cent(i); i += 1 }
        val denom = vn * norms(c)
        sims(c) = if (denom == 0.0) Double.NegativeInfinity else dot / denom
        c += 1
      }
      val k = math.min(nprobe, centroids.length)
      val idx = Array.range(0, centroids.length)
        .sortBy(j => (-sims(j), j)).take(k)
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(idx)
    }

    override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
      copy(child = newChild)
  }

  /** Product-quantization encode: split `v` into `codebooks.length`
    * contiguous subspaces and emit, per subspace, the index of the
    * L2-nearest sub-centroid — the standard PQ code (ties → lowest index).
    * Input array<double>, output array<int> of length m. The code is what
    * a 100 TB ANN first pass scans: m small ints instead of dim doubles
    * (64×8 B → 4×4 B here, 32× smaller). */
  case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
      extends UnaryExpression with CodegenFallback {
    require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty))
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "pq_encode"

    override protected def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val m = codebooks.length
      val out = new Array[Int](m)
      var off = 0
      var s = 0
      while (s < m) {
        val cb = codebooks(s)
        val subDim = cb(0).length
        var best = 0
        var bestD = Double.PositiveInfinity
        var j = 0
        while (j < cb.length) {
          val cent = cb(j)
          var dist = 0.0
          var i = 0
          while (i < subDim) {
            val d = v.getDouble(off + i) - cent(i)
            dist += d * d
            i += 1
          }
          if (dist < bestD) { bestD = dist; best = j }
          j += 1
        }
        out(s) = best
        off += subDim
        s += 1
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
    }

    override protected def withNewChildInternal(newChild: Expression): PqEncode =
      copy(child = newChild)
  }

  /** Asymmetric-distance (ADC) cosine: cosine between the RAW query vector
    * and the RECONSTRUCTION of a PQ code (per-subspace centroid concat) —
    * computed without materializing the reconstruction. Sub-centroid
    * norms are data-independent and precomputed once per expression.
    * Null when either norm is zero ([[CosineSim]] parity). */
  case class PqAdcCosine(left: Expression, right: Expression,
                         codebooks: Array[Array[Array[Double]]])
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "pq_adc_cosine"
    override def nullable: Boolean = true

    // |recon|² contribution of sub-centroid j in subspace s
    @transient private lazy val subNormsSq: Array[Array[Double]] =
      codebooks.map(_.map { c =>
        var ss = 0.0; var i = 0
        while (i < c.length) { ss += c(i) * c(i); i += 1 }
        ss
      })

    /** left = query array<double>, right = code array<int>. */
    override protected def nullSafeEval(q: Any, code: Any): Any = {
      val qv = q.asInstanceOf[ArrayData]
      val cd = code.asInstanceOf[ArrayData]
      val m = codebooks.length
      // a code from a different encoder (wrong subspace count or centroid
      // range) must fail loudly — silent truncation would return
      // plausible-but-wrong similarities that skew rankings undetectably
      if (cd.numElements() != m)
        throw new IllegalArgumentException(
          s"PQ code has ${cd.numElements()} subspaces but codebooks have $m — mis-paired encoder")
      var dot = 0.0
      var reconSq = 0.0
      var qSq = 0.0
      var off = 0
      var s = 0
      while (s < m) {
        val ci = cd.getInt(s)
        if (ci < 0 || ci >= codebooks(s).length)
          throw new IllegalArgumentException(
            s"PQ centroid index $ci out of range [0, ${codebooks(s).length}) in subspace $s")
        val cent = codebooks(s)(ci)
        val subDim = cent.length
        var i = 0
        while (i < subDim) {
          val qi = qv.getDouble(off + i)
          dot += qi * cent(i)
          qSq += qi * qi
          i += 1
        }
        reconSq += subNormsSq(s)(ci)
        off += subDim
        s += 1
      }
      val denom = math.sqrt(qSq) * math.sqrt(reconSq)
      if (denom == 0.0) null else dot / denom
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdcCosine =
      copy(left = l, right = r)
  }

  import org.apache.spark.sql.graftbridge.ExprBridge.{toColumn => column, toExpression => expression}
  def cosineSim(a: Column, b: Column): Column = column(CosineSim(expression(a), expression(b)))
  def pqEncode(v: Column, codebooks: Array[Array[Array[Double]]]): Column =
    column(PqEncode(expression(v), codebooks))
  def pqAdcCosine(q: Column, code: Column, codebooks: Array[Array[Array[Double]]]): Column =
    column(PqAdcCosine(expression(q), expression(code), codebooks))
  def hyperplaneSigs(v: Column, planes: Array[Array[Array[Double]]]): Column =
    column(HyperplaneSigs(expression(v), planes))
  def nearestCentroids(v: Column, centroids: Array[Array[Double]], nprobe: Int): Column =
    column(NearestCentroids(expression(v), centroids, nprobe))
}
