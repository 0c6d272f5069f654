package graft.plans

import graft.geom.{Geometry, Predicates, Wkb}
import graft.sql.{GraftScalar, PreparedSide}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftOuter, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.Decimal

/** Planner strategy: an inner / left-outer / right-outer join whose
  * condition is an `st_*` predicate (and no equi keys) with a SMALL
  * build side (the non-preserved side, for outer joins) becomes an
  * [[IndexedSpatialJoinExec]] instead of Spark's BroadcastNestedLoopJoin.
  * The nested-loop plan evaluates the exact predicate — decoding BOTH
  * geometries — for every (stream, build) pair; the indexed plan collects
  * the small side once, broadcasts it, builds a packed STR-tree per
  * executor, and per stream row pays one envelope scan + an O(log M) tree
  * walk + exact kernels on true candidates only. Works for any
  * `spark.sql(...)` text query or raw DataFrame join — the GeoDataFrame
  * `sjoin` API is not required.
  *
  * Complements [[SpatialJoinRewrite]] (both sides large → grid equi-join,
  * optimizer rule): this strategy fires only when the rewrite declined —
  * one side below the broadcast threshold — and never on its output
  * (the rewritten condition carries anchor-cell equi keys, which the
  * equi-key guard rejects).
  */
object IndexedSpatialJoinStrategy extends SparkStrategy {

  // SQL function name -> PreparedSide.kernel name (the two diverge for the
  // snake_case kernels: st_coveredby -> covered_by etc.)
  private val SUPPORTED: Map[String, String] = Map(
    "st_intersects"         -> "intersects",
    "st_contains"           -> "contains",
    "st_within"             -> "within",
    "st_covers"             -> "covers",
    "st_coveredby"          -> "covered_by",
    "st_containsproperly"   -> "contains_properly",
    "st_touches"            -> "touches",
    "st_crosses"            -> "crosses",
    "st_overlaps"           -> "overlaps",
    "st_equals"             -> "equals")

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Join(left, right, joinType @ (Inner | LeftOuter | RightOuter), Some(cond), _)
        if cond.deterministic &&
          SQLConf.get.getConfString("spark.graft.sjoin.broadcast.index", "true").toBoolean =>
      val conjuncts = PlanPredicates.splitConjuncts(cond)
      def sided(a: Expression, b: Expression): Boolean =
        a.references.nonEmpty && b.references.nonEmpty &&
          a.references.subsetOf(left.outputSet) &&
          b.references.subsetOf(right.outputSet)
      // any equi key -> Spark's hash join on that key is the better frame
      val hasEquiKey = conjuncts.exists {
        case EqualTo(a, b)         => sided(a, b) || sided(b, a)
        case EqualNullSafe(a, b)   => sided(a, b) || sided(b, a)
        case _                     => false
      }
      if (hasEquiKey) return Nil
      // (expr over left, expr over right, predicate, distance, firstArgIsLeft)
      val spatial = conjuncts.collectFirst {
        case p @ GraftScalar(name, Seq(a, b)) if SUPPORTED.contains(name) && sided(a, b) =>
          (p: Expression, a, b, SUPPORTED(name), 0.0, true)
        case p @ GraftScalar(name, Seq(a, b)) if SUPPORTED.contains(name) && sided(b, a) =>
          (p: Expression, b, a, SUPPORTED(name), 0.0, false)
        case p @ GraftScalar("st_dwithin", Seq(a, b, d))
            if d.foldable && foldDouble(d).isDefined && sided(a, b) =>
          (p: Expression, a, b, "dwithin", foldDouble(d).get, true)
        case p @ GraftScalar("st_dwithin", Seq(a, b, d))
            if d.foldable && foldDouble(d).isDefined && sided(b, a) =>
          (p: Expression, b, a, "dwithin", foldDouble(d).get, false)
      }
      spatial match {
        case Some((spatialPred, lGeom, rGeom, pred, dist, firstIsLeft)) =>
          val residual = conjuncts.filterNot(_ eq spatialPred)
            .reduceOption(And)
          // outer joins must stream the preserved side: the build side is
          // forced to the non-preserved one
          def exec(buildRight: Boolean) =
            IndexedSpatialJoinExec(planLater(left), planLater(right), lGeom, rGeom,
              pred, dist, firstIsLeft, buildRight, joinType, residual) :: Nil
          joinType match {
            case Inner if isSmall(right)      => exec(buildRight = true)
            case Inner if isSmall(left)       => exec(buildRight = false)
            case LeftOuter if isSmall(right)  => exec(buildRight = true)
            case RightOuter if isSmall(left)  => exec(buildRight = false)
            case _                            => Nil
          }
        case None => Nil
      }
    case _ => Nil
  }

  /** None when the foldable distance evaluates to null (or a
    * non-numeric): the predicate is then NULL-for-every-row under the
    * normal plan, so the strategy must DECLINE rather than join at
    * distance 0 — results may not depend on plan choice.
    */
  private def foldDouble(e: Expression): Option[Double] = e.eval(null) match {
    case d: java.lang.Double  => Some(d.doubleValue())
    case f: java.lang.Float   => Some(f.toDouble)
    case d: Decimal           => Some(d.toDouble)
    case n: java.lang.Number  => Some(n.doubleValue())
    case _                    => None
  }


  // same contract as GeoDataFrame.rightIsSmall: parquet-encoded stats must
  // fit the broadcast threshold WITH the in-memory WKB expansion factor
  private def isSmall(p: LogicalPlan): Boolean = {
    val threshold = SQLConf.get.autoBroadcastJoinThreshold
    threshold > 0 && p.stats.sizeInBytes * 8 < BigInt(threshold)
  }
}

/** Physical indexed spatial join. The build (small) side is collected and
  * broadcast ONCE as the rows plus a lazily-materialized
  * [[graft.sql.PreparedSide]] (decoded geometries + packed STR-tree, built
  * once per executor JVM); each stream row queries the tree with its
  * envelope (dwithin: expanded by the distance) and runs the exact kernel
  * on surviving candidates only, in the argument order the query wrote.
  * Residual conjuncts are evaluated on the joined row, matching the
  * nested-loop plan's condition semantics. Output rows are UnsafeRows, so
  * any downstream exchange consumes them directly.
  */
case class IndexedSpatialJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    lGeom: Expression,
    rGeom: Expression,
    predicate: String,
    distance: Double,
    firstArgIsLeft: Boolean,
    buildRight: Boolean,
    joinType: JoinType,
    residual: Option[Expression]) extends SparkPlan {

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "buildRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "build side rows"),
    "candidateRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "tree candidate pairs tested"))

  override def children: Seq[SparkPlan] = Seq(left, right)
  // the stream side passes through unchanged (like
  // BroadcastNestedLoopJoinExec's streamed.outputPartitioning) — without
  // this the default UnknownPartitioning forces a re-shuffle the
  // replaced nested-loop plan never needed
  override def outputPartitioning
      : org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    if (buildRight) left.outputPartitioning else right.outputPartitioning
  override def output: Seq[Attribute] = joinType match {
    case LeftOuter  => left.output ++ right.output.map(_.withNullability(true))
    case RightOuter => left.output.map(_.withNullability(true)) ++ right.output
    case _          => left.output ++ right.output
  }

  override protected def withNewChildrenInternal(children: IndexedSeq[SparkPlan]): SparkPlan =
    copy(left = children(0), right = children(1))

  override protected def doExecute(): RDD[InternalRow] = {
    val (buildPlan, streamPlan) = if (buildRight) (right, left) else (left, right)
    val buildGeom = BindReferences.bindReference(
      if (buildRight) rGeom else lGeom, buildPlan.output)
    val streamGeom = BindReferences.bindReference(
      if (buildRight) lGeom else rGeom, streamPlan.output)
    val buildSide = new SpatialBuildSide(buildPlan.executeCollect(), buildGeom)
    longMetric("buildRows") += buildSide.rows.length
    val bc = sparkContext.broadcast(buildSide)
    val numOutputRows = longMetric("numOutputRows")
    val candidateRows = longMetric("candidateRows")
    // does the probe (stream) geometry supply the predicate's FIRST arg?
    val probeFirst = if (buildRight) firstArgIsLeft else !firstArgIsLeft
    val pred = predicate
    val dist = distance
    val bRight = buildRight
    val resExpr = residual
    val outAttrs = output
    val outer = joinType != Inner
    val buildWidth = buildPlan.output.size
    streamPlan.execute().mapPartitions { iter =>
      val side = bc.value
      val prepared = side.prepared
      val rows = side.rows
      val kern: (Geometry, Geometry) => Boolean =
        if (pred == "dwithin") null else PreparedSide.kernel(pred)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val resPred = resExpr.map(Predicate.create(_, outAttrs))
      resPred.foreach(_.initialize(0))
      // null-padded build side for preserved stream rows with no match
      val nullBuild: InternalRow = new GenericInternalRow(buildWidth)
      def emit(streamRow: InternalRow, build: InternalRow): InternalRow =
        resultProj(if (bRight) joined(streamRow, build) else joined(build, streamRow))
      iter.flatMap { streamRow =>
        // phase 1: matched build indices (JoinedRow is a view — rebuild at
        // emit time, so no row copies are buffered). The refinement loop
        // is PreparedSide.visitCandidates — the same code the DSv2 probe
        // expression runs, so the two plans agree by construction.
        val matched = new scala.collection.mutable.ArrayBuilder.ofInt
        val bytes = streamGeom.eval(streamRow).asInstanceOf[Array[Byte]]
        if (bytes != null) {
          candidateRows += PreparedSide.visitCandidates(
            prepared, bytes, pred, kern, dist, probeFirst, { i =>
              val j = if (bRight) joined(streamRow, rows(i)) else joined(rows(i), streamRow)
              if (resPred.forall(_.eval(j))) matched += i
            })
        }
        val m = matched.result()
        if (m.length == 0) {
          if (outer) { numOutputRows += 1; Iterator.single(emit(streamRow, nullBuild)) }
          else Iterator.empty
        } else {
          numOutputRows += m.length
          m.iterator.map(i => emit(streamRow, rows(i)))
        }
      }
    }
  }
}

/** Broadcast payload of [[IndexedSpatialJoinExec]]: the collected build
  * rows plus the prepared index, materialized lazily so only the compact
  * rows ship over the wire and the decode + tree build run once per
  * executor JVM.
  */
final class SpatialBuildSide(
    val rows: Array[InternalRow],
    boundGeom: Expression) extends Serializable {
  @transient lazy val prepared: PreparedSide = new PreparedSide(
    rows.map(r => boundGeom.eval(r).asInstanceOf[Array[Byte]]))
}
