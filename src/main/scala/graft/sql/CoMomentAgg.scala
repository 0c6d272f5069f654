package graft.sql

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.GraftInterop.AbsType

/** One-pass co-moment sketch over an embedding column: accumulates
  * `[n, sum_0..sum_{d-1}, upper-triangle sum(x_i * x_j)]` — everything a
  * PCA fit needs (mean + population covariance) in a single narrow scan.
  *
  * This is the scale shape of the fit: the buffer is `1 + d + d(d+1)/2`
  * doubles (d=64 → ~17 KB), partial aggregation combines map-side and the
  * merge tree ships one buffer per task, so a 100 TB corpus reduces to one
  * driver-side d×d matrix with zero data shuffles. The reference has no
  * PCA; the shape mirrors its ApplyConcatApply tree aggregation
  * (`dask_geopandas/expr.py:33-72`) applied to second moments.
  *
  * Rows whose vector is null, of a different length than `dim`, or
  * contains a null / NaN / infinite element are skipped (counted out of
  * `n`), matching the engine's null-skipping aggregate convention — a
  * null array slot decodes as 0.0 through `ArrayData`, and a single
  * NaN/Inf element would poison every co-moment it touches, so neither
  * may silently enter the fit.
  */
case class CoMomentAgg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression]
  with ExpectsInputTypes {

  require(dim > 0, "dim must be positive")

  private val size = 1 + dim + dim * (dim + 1) / 2

  // accepts array<float> or array<double>; anything else is rejected here
  override def inputTypes: Seq[AbsType] = Seq(ArrayType)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"gr_comoments expects array<float|double>, got ${other.sql}")
    }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "gr_comoments"

  // lazy: the child is unresolved at construction time
  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def createAggregationBuffer(): Array[Double] = new Array[Double](size)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() == dim) {
        // decode once into a local vector, then accumulate the upper
        // triangle; bail on null slots (ArrayData would read them as 0.0)
        // and non-finite values (one NaN poisons every moment it touches)
        val x = new Array[Double](dim)
        var ok = true
        var i = 0
        while (ok && i < dim) {
          if (arr.isNullAt(i)) ok = false
          else {
            val d = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
            if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) ok = false
            else x(i) = d
          }
          i += 1
        }
        if (!ok) return buf
        buf(0) += 1.0
        i = 0
        var t = 1 + dim
        while (i < dim) {
          buf(1 + i) += x(i)
          var j = i
          while (j < dim) {
            buf(t) += x(i) * x(j)
            j += 1
            t += 1
          }
          i += 1
        }
      }
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < size) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(size * 8)
    var i = 0
    while (i < size) { bb.putDouble(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(size)(bb.getDouble())
  }

  override def withNewMutableAggBufferOffset(n: Int): CoMomentAgg = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CoMomentAgg = copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): CoMomentAgg = copy(child = newChild)
}
