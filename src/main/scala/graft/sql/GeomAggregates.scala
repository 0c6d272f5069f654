package graft.sql

import graft.geom._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.sql.GraftInterop.AbsType
import graft.geom.Geometry // shadow spark.sql.types.Geometry from the wildcard

import scala.collection.mutable

/** Mutable buffer for geometry aggregation: point sets are deduped
  * incrementally (hash set); in dissolve mode areal parts fold through a
  * bounded [[Overlay.CascadedUnion]] as they arrive, so the buffer holds
  * O(log n) partial unions instead of every input geometry — a dissolve
  * over an arbitrarily large polygon group streams instead of OOMing.
  * Collect mode (`dissolve = false`) keeps raw parts, as its semantics
  * require. This is the Spark form of the reference's ApplyConcatApply tree
  * aggregation (`dask_geopandas/expr.py:33-41` union_all chunk/aggregate) —
  * partial aggregation (map-side combine) and merge come from
  * TypedImperativeAggregate for free.
  */
final class GeomAggBuffer(val dissolve: Boolean) {

  val points: mutable.LinkedHashSet[(Double, Double)] = mutable.LinkedHashSet.empty
  // collect mode: every non-point part; dissolve mode: only dim<2 parts
  // (rare in a dissolve — lines are collected, not noded, like Overlay.union)
  val others: mutable.ArrayBuffer[Geometry] = mutable.ArrayBuffer.empty
  private val areal: Overlay.CascadedUnion = if (dissolve) new Overlay.CascadedUnion() else null

  def add(g: Geometry): Unit = g match {
    case p: Point if !p.isEmpty => points += ((p.x, p.y))
    case mp: MultiPoint => mp.pts.foreach(p => if (!p.isEmpty) points += ((p.x, p.y)))
    case g2 if g2.isEmpty =>
    case gc: GeometryCollection => gc.geoms.foreach(add)
    case other =>
      if (dissolve && other.topoDim == 2) areal.add(other)
      else others += other
  }

  private def arealParts: Seq[Geometry] = if (areal == null) Nil else areal.parts

  def merge(o: GeomAggBuffer): Unit = {
    points ++= o.points
    o.others.foreach(add)
    o.arealParts.foreach(add)
  }

  def result(): Geometry = {
    val ptGeom =
      if (points.isEmpty) Nil
      else Seq(Overlay.unionPoints(Seq(MultiPoint(points.toArray.map { case (x, y) => Point(x, y) }))))
    val arealSeq = if (areal == null) Nil else areal.result().toSeq
    val all = ptGeom ++ arealSeq ++ others
    if (all.isEmpty) GeometryCollection(Array.empty)
    else if (all.lengthCompare(1) == 0) all.head
    else Overlay.unionAll(all)
  }

  def collected(): Geometry = {
    val pts = points.toArray.map { case (x, y) => Point(x, y): Geometry }
    Geometry.collect(pts.toIndexedSeq ++ others ++ arealParts)
  }
}

abstract class GeomAggBase
    extends TypedImperativeAggregate[GeomAggBuffer] with UnaryLike[Expression]
    with ExpectsInputTypes {

  def child: Expression
  protected def resultFromBuffer(buf: GeomAggBuffer): Any
  /** true = geometric union semantics (bounded streaming buffer);
    * false = collect semantics (raw parts retained by definition). */
  protected def dissolveBuffer: Boolean
  override def inputTypes: Seq[AbsType] = Seq(BinaryType)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): GeomAggBuffer = new GeomAggBuffer(dissolveBuffer)

  override def update(buf: GeomAggBuffer, input: InternalRow): GeomAggBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(Wkb.read(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: GeomAggBuffer, other: GeomAggBuffer): GeomAggBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: GeomAggBuffer): Any = resultFromBuffer(buf)

  override def serialize(buf: GeomAggBuffer): Array[Byte] = Wkb.write(buf.collected())

  override def deserialize(bytes: Array[Byte]): GeomAggBuffer = {
    val b = createAggregationBuffer()
    b.add(Wkb.read(bytes))
    b
  }
}

/** Geometric union of all input geometries (reference union_all,
  * `dask_geopandas/expr.py:287-299`; dissolve's geometry agg,
  * `expr.py:688-694`).
  */
case class StUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends GeomAggBase {
  protected def resultFromBuffer(b: GeomAggBuffer): Any = Wkb.write(b.result())
  protected def dissolveBuffer: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_union_agg"
  override def withNewMutableAggBufferOffset(n: Int): StUnionAgg = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): StUnionAgg = copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): StUnionAgg = copy(child = newChild)
}

/** Collect inputs into a single (Multi…/GeometryCollection) geometry without
  * dissolving boundaries — the builder behind grouped multipoint construction.
  */
case class StCollectAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends GeomAggBase {
  protected def resultFromBuffer(b: GeomAggBuffer): Any = Wkb.write(b.collected())
  protected def dissolveBuffer: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_collect_agg"
  override def withNewMutableAggBufferOffset(n: Int): StCollectAgg = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): StCollectAgg = copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): StCollectAgg = copy(child = newChild)
}

/** total_bounds (reference `dask_geopandas/expr.py:44-72,270-280`): global
  * envelope as struct<xmin,ymin,xmax,ymax>. Buffer is 4 doubles — cheap.
  */
case class StEnvelopeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression]
  with ExpectsInputTypes {

  override def inputTypes: Seq[AbsType] = Seq(BinaryType)
  override def nullable: Boolean = true
  override def dataType: DataType = GraftDefs.boundsStruct
  override def prettyName: String = "st_envelope_agg"

  override def createAggregationBuffer(): Array[Double] =
    Array(Double.PositiveInfinity, Double.PositiveInfinity,
      Double.NegativeInfinity, Double.NegativeInfinity)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      // envelope straight off the WKB bytes — no per-row geometry decode
      val e = Wkb.envelopeOf(v.asInstanceOf[Array[Byte]])
      if (!e.isEmpty) {
        if (e.minX < buf(0)) buf(0) = e.minX
        if (e.minY < buf(1)) buf(1) = e.minY
        if (e.maxX > buf(2)) buf(2) = e.maxX
        if (e.maxY > buf(3)) buf(3) = e.maxY
      }
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    if (b(0) < a(0)) a(0) = b(0)
    if (b(1) < a(1)) a(1) = b(1)
    if (b(2) > a(2)) a(2) = b(2)
    if (b(3) > a(3)) a(3) = b(3)
    a
  }

  override def eval(buf: Array[Double]): Any =
    if (buf(0) > buf(2)) null
    else new GenericInternalRow(Array[Any](buf(0), buf(1), buf(2), buf(3)))

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(32)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(4)(bb.getDouble())
  }

  override def withNewMutableAggBufferOffset(n: Int): StEnvelopeAgg = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): StEnvelopeAgg = copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): StEnvelopeAgg = copy(child = newChild)
}

/** Running-fold buffer for [[StIntersectionAgg]]: the n-ary intersection
  * only ever SHRINKS, so the buffer is a single geometry — map-side
  * partial aggregation ships one geometry per group per task, and an
  * already-empty running intersection short-circuits further clipping.
  */
final class IntersectionAllBuffer {
  var seen = false
  var g: Geometry = GeometryCollection(Array.empty)
  def add(x: Geometry): Unit = {
    if (!seen) { seen = true; g = x }
    else if (!g.isEmpty) g = Overlay.intersection(g, x)
  }
  def merge(o: IntersectionAllBuffer): Unit = if (o.seen) add(o.g)
}

/** Geometric intersection of all input geometries in the group —
  * geopandas 1.0 `GeoSeries.intersection_all` (nulls skipped; an empty
  * group yields GEOMETRYCOLLECTION EMPTY). Intersection is commutative
  * and associative, so partial/merge order never changes the result
  * beyond `Overlay`'s usual snap-rounding contract.
  */
case class StIntersectionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[IntersectionAllBuffer] with UnaryLike[Expression]
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbsType] = Seq(BinaryType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_intersection_agg"

  override def createAggregationBuffer(): IntersectionAllBuffer = new IntersectionAllBuffer

  override def update(buf: IntersectionAllBuffer, input: InternalRow): IntersectionAllBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(Wkb.read(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: IntersectionAllBuffer, other: IntersectionAllBuffer): IntersectionAllBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: IntersectionAllBuffer): Any = Wkb.write(buf.g)

  override def serialize(buf: IntersectionAllBuffer): Array[Byte] =
    if (!buf.seen) Array.emptyByteArray else Wkb.write(buf.g)

  override def deserialize(bytes: Array[Byte]): IntersectionAllBuffer = {
    val b = createAggregationBuffer()
    if (bytes.nonEmpty) b.add(Wkb.read(bytes))
    b
  }

  override def withNewMutableAggBufferOffset(n: Int): StIntersectionAgg = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): StIntersectionAgg = copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): StIntersectionAgg = copy(child = newChild)
}
