package graft.sql

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType}
import org.apache.spark.sql.GraftInterop.AbsType
import graft.geom.{Envelope, Geometry, Predicates, StrTree, Wkb}

/** The build side of an indexed broadcast spatial join.
  *
  * Shipped to executors as the compact WKB the rows already carry; the
  * decoded geometries, envelopes, and packed STR-tree are materialized
  * lazily ONCE per executor JVM (transient lazy vals) on first probe. This
  * replaces the BroadcastNestedLoopJoin plan — which re-decodes BOTH sides
  * of every (probe, build) pair and runs the exact predicate N_build times
  * per probe row — with one probe-side decode and O(log n + candidates)
  * work per row. Decode is 85% of the binary-predicate hot path
  * (PROFILE.md), so at 100 TB with a 10^4-row build side this is the
  * difference between 10^4 exact predicates per probe row and a handful.
  *
  * Rows with null or empty geometry never enter the tree: every supported
  * sjoin predicate implies envelope interaction and is false for empties
  * (EmptyGeometrySpec), matching the nested-loop plan where a null WKB
  * nulls out the predicate.
  */
final class PreparedSide(wkbs: Array[Array[Byte]]) extends Serializable {
  @transient lazy val geoms: Array[Geometry] =
    wkbs.map(b => if (b == null) null else Wkb.read(b))
  @transient lazy val envs: Array[Envelope] =
    wkbs.map(b => if (b == null) Envelope.empty else Wkb.envelopeOf(b))
  @transient lazy val tree: StrTree = StrTree.build(envs)
}

object PreparedSide {
  /** Exact-refinement kernel for an sjoin predicate name, probe side first —
    * the SAME kernel entry points the `st_*` Catalyst expressions call, so
    * the indexed and nested-loop plans agree bit-for-bit on edge cases
    * (multi-part decomposition, GEOS-faithful boundary rules, empties).
    */
  def kernel(predicate: String): (Geometry, Geometry) => Boolean = predicate match {
    case "intersects"        => Predicates.intersects
    case "contains"          => Predicates.contains
    case "contains_properly" => Predicates.containsProperly
    case "within"            => Predicates.within
    case "covers"            => Predicates.covers
    case "covered_by"        => Predicates.coveredBy
    case "touches"           => Predicates.touches
    case "crosses"           => Predicates.crosses
    case "overlaps"          => Predicates.overlaps
    case "equals"            => Predicates.geomEquals
    case other =>
      throw new IllegalArgumentException(s"unknown indexed sjoin predicate $other")
  }

  /** Shared candidate refinement: tree query + the dwithin envelope-gap
    * lower bound + lazy probe decode, invoking `emit(i)` for every build
    * index whose exact kernel passes (`probeFirst` puts the probe
    * geometry in the predicate's first argument slot). BOTH consumers —
    * [[IndexedSjoinProbe.candidates]] and `IndexedSpatialJoinExec` —
    * drive THIS loop, so their documented bit-for-bit agreement holds by
    * construction instead of by parallel maintenance. Returns the tree
    * candidate count (the metric feed).
    */
  def visitCandidates(side: PreparedSide, bytes: Array[Byte],
      predicate: String, kern: (Geometry, Geometry) => Boolean,
      distance: Double, probeFirst: Boolean, emit: Int => Unit): Int = {
    val probeEnv = Wkb.envelopeOf(bytes)
    val qEnv = if (predicate == "dwithin") probeEnv.expand(distance) else probeEnv
    val cand = side.tree.query(qEnv)
    var probe: Geometry = null
    val d2 = distance * distance
    var k = 0
    while (k < cand.length) {
      val i = cand(k)
      val ok =
        if (predicate == "dwithin") {
          val eb = side.envs(i)
          val dx = math.max(0.0, math.max(eb.minX - probeEnv.maxX, probeEnv.minX - eb.maxX))
          val dy = math.max(0.0, math.max(eb.minY - probeEnv.maxY, probeEnv.minY - eb.maxY))
          dx * dx + dy * dy <= d2 && {
            if (probe == null) probe = Wkb.read(bytes)
            Predicates.dWithin(probe, side.geoms(i), distance)
          }
        } else {
          if (probe == null) probe = Wkb.read(bytes)
          if (probeFirst) kern(probe, side.geoms(i))
          else kern(side.geoms(i), probe)
        }
      if (ok) emit(i)
      k += 1
    }
    cand.length
  }
}

/** Catalyst expression: indices of broadcast-side rows matching the probe
  * geometry under `predicate` — `array<int>` feeding an `explode` and an
  * integer equi-join against the (small) build side, which Spark plans as a
  * BroadcastHashJoin. The expensive spatial work happens HERE, once per
  * probe row, inside whole-stage codegen (doGenCode calls straight into
  * this instance via a codegen reference — same pattern as GraftScalar).
  *
  * `predicate = "dwithin"` queries the tree with the probe envelope
  * expanded by `distance` and applies the same envelope-distance lower
  * bound short-circuit as the scalar `st_dwithin` before decoding.
  */
case class IndexedSjoinProbe(
    child: Expression,
    predicate: String,
    distance: Double,
    index: Broadcast[PreparedSide])
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbsType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = s"st_indexed_$predicate"

  @transient private lazy val kern: (Geometry, Geometry) => Boolean =
    if (predicate == "dwithin") null else PreparedSide.kernel(predicate)

  def candidates(bytes: Array[Byte]): ArrayData = {
    val out = new scala.collection.mutable.ArrayBuilder.ofInt
    PreparedSide.visitCandidates(index.value, bytes, predicate, kern,
      distance, probeFirst = true, out += _)
    UnsafeArrayData.fromPrimitiveArray(out.result())
  }

  override def nullSafeEval(input: Any): Any =
    candidates(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sjoinProbe", this, classOf[IndexedSjoinProbe].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.candidates($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): IndexedSjoinProbe =
    copy(child = newChild)
}

/** Catalyst expression: the broadcast-side rows NEAREST to the probe
  * geometry — `array<struct<idx:int, dist:double>>` holding every tie at
  * the minimum exact distance (the geopandas `sjoin_nearest` keep-all-ties
  * contract), empty when nothing lies within `maxDistance`. Branch-and-bound
  * over the prepared STR-tree: subtrees whose envelope gap cannot beat the
  * running best are never visited, and the probe WKB is decoded only if at
  * least one exact distance is evaluated. `exclusive` skips
  * topologically-equal right geometries at distance 0 (shapely
  * `query_nearest(exclusive=True)`).
  */
case class IndexedNearestProbe(
    child: Expression,
    maxDistance: Double,
    exclusive: Boolean,
    index: Broadcast[PreparedSide],
    // k-nearest generalization (rank() <= k tie contract); k = 1 takes the
    // single-pass tie-tracking nearest search
    k: Int = 1)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbsType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("idx", IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("dist",
        org.apache.spark.sql.types.DoubleType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "st_indexed_nearest"

  def candidates(bytes: Array[Byte]): ArrayData = {
    val side = index.value
    val probeEnv = Wkb.envelopeOf(bytes)
    if (probeEnv.isEmpty)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    var probe: Geometry = null
    val exact = { (i: Int) =>
      if (probe == null) probe = Wkb.read(bytes)
      val g = side.geoms(i)
      val d = graft.geom.Measures.distance(probe, g)
      if (exclusive && d == 0.0 && Predicates.geomEquals(probe, g)) Double.NaN else d
    }
    val hits: Array[(Int, Double)] =
      if (k == 1) {
        val (ties, best) = side.tree.nearest(probeEnv, maxDistance, exact)
        ties.map(i => (i, best))
      } else side.tree.kNearest(probeEnv, k, maxDistance, exact)
    val rows = new Array[Any](hits.length)
    var j = 0
    while (j < hits.length) {
      rows(j) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](hits(j)._1, hits(j)._2))
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }

  override def nullSafeEval(input: Any): Any =
    candidates(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestProbe", this, classOf[IndexedNearestProbe].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.candidates($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): IndexedNearestProbe =
    copy(child = newChild)
}
