package graft.plans

import graft.geom.{Envelope, Wkb}
import graft.sql.GraftScalar
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import scala.collection.mutable.ArrayBuffer

/** Catalyst optimizer rule: derive plain range predicates from opaque
  * spatial filters so they reach the parquet scan (row-group min/max
  * skipping, PushedFilters) — the optimizer analog of the reference's
  * partition pruning for `.cx` (`dask_geopandas/expr.py:1042-1070`), but
  * applied at plan time to ANY query, with no API hint needed.
  *
  * Rewrites (always ANDed with the original predicate — semantics are
  * strengthened-by-redundancy, never changed):
  *
  *  - `st_intersectsbox(st_point(x, y), x0, y0, x1, y1)` with literal
  *    bounds  ->  `x >= x0 AND x <= x1 AND y >= y0 AND y <= y1`
  *  - `st_dwithin(st_point(x, y), <foldable geom>, d)`  ->  ranges over
  *    the geometry's envelope expanded by d
  *  - `st_distance(st_point(x, y), <foldable geom>) < d` (or `<=`, and the
  *    mirrored `>`/`>=` forms)  ->  same expanded-envelope ranges
  *
  * The point arguments may be arbitrary deterministic expressions; when
  * they are (casts of) source columns, Catalyst's scan planning turns the
  * ranges into parquet data filters. Registered via [[GraftExtensions]] or
  * `graft.sql.functions.install`.
  */
object SpatialFilterPushdown extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val present = conjuncts.map(_.canonicalized).toSet
      val extra = (conjuncts.flatMap(derived) ++
          coveringDerived(conjuncts, child.output))
        .filterNot(e => present.contains(e.canonicalized))
        .distinct
      if (extra.isEmpty) f
      else Filter((conjuncts ++ extra).reduceLeft(And), child)
  }

  /** GeoParquet 1.1 covering rewrite: when a filtered geometry column
    * carries the `graft.covering` metadata stamped by `GeoParquetIO.read`
    * (naming its sibling bbox struct column), every bbox-derivable spatial
    * conjunct also emits four plain DOUBLE range predicates over the
    * covering struct's xmin/ymin/xmax/ymax — predicates Spark's
    * nested-field pushdown carries into the parquet scan, so row-group
    * min/max stats (and whole files) skip on a PLAIN `.filter(st_*)`,
    * with no `.cx` hint. Redundant-by-construction: the envelope test is
    * necessary for every predicate the table derives, and the original
    * conjunct remains as the exact refinement. The null-tolerant
    * `IsNull(bbox) OR ranges` form (same as the `.cx` covering path) keeps
    * rows whose covering slot is null — an EXTERNAL GeoParquet 1.1 writer
    * may emit null bbox for empty geometries — and still reaches
    * PushedFilters as `Or(IsNull(...), And(...))`.
    */
  private def coveringDerived(conjuncts: Seq[Expression],
      output: Seq[Attribute]): Seq[Expression] = {
    val bboxFields = Seq("xmin", "ymin", "xmax", "ymax")
    output.filter(_.metadata.contains("graft.covering")).flatMap { g =>
      val covName = g.metadata.getString("graft.covering")
      output.find(_.name == covName).toSeq.flatMap { cov =>
        cov.dataType match {
          case st: org.apache.spark.sql.types.StructType
            if bboxFields.forall(f => st.fieldNames.contains(f) &&
              st(f).dataType == DoubleType) =>
            def fld(n: String) =
              GetStructField(cov, st.fieldIndex(n), Some(n))
            conjuncts.flatMap(graft.plans.V2BboxPushdown.envForAttr(_, g)).map { env =>
              // the null guard tests the xmin LEAF, not the struct: parquet
              // cannot express IsNull on a group column, and an
              // unconvertible branch voids the whole Or for row-group
              // skipping (a null covering struct nulls every field, so the
              // leaf test is equivalent)
              Or(IsNull(fld("xmin")), Seq(
                LessThanOrEqual(fld("xmin"), Literal(env.maxX)),
                GreaterThanOrEqual(fld("xmax"), Literal(env.minX)),
                LessThanOrEqual(fld("ymin"), Literal(env.maxY)),
                GreaterThanOrEqual(fld("ymax"), Literal(env.minY)))
                .reduceLeft[Expression](And))
            }
          case _ => Nil
        }
      }
    }
  }

  private def splitConjunctivePredicates(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
    case other     => Seq(other)
  }

  private[plans] def dLit(e: Expression): Option[Double] = e match {
    case Literal(v: Double, DoubleType) => Some(v)
    case _ if e.foldable && e.dataType == DoubleType =>
      // pre-constant-folding shapes (e.g. Cast(intLit) in the analyzed plan)
      try Option(e.eval(null)).map(_.asInstanceOf[Double])
      catch { case _: Exception => None }
    case _ => None
  }

  /** Envelope of a foldable geometry expression, if evaluable. */
  private[plans] def foldEnvelope(e: Expression): Option[Envelope] =
    if (!e.foldable) None
    else try {
      e.eval(null) match {
        case b: Array[Byte] =>
          val env = Wkb.read(b).envelope
          if (env.isEmpty) None else Some(env)
        case _ => None
      }
    } catch { case _: Exception => None }

  private def ranges(x: Expression, y: Expression, env: Envelope): Seq[Expression] = {
    if (!x.deterministic || !y.deterministic) return Nil
    Seq(
      GreaterThanOrEqual(x, Literal(env.minX, DoubleType)),
      LessThanOrEqual(x, Literal(env.maxX, DoubleType)),
      GreaterThanOrEqual(y, Literal(env.minY, DoubleType)),
      LessThanOrEqual(y, Literal(env.maxY, DoubleType)))
  }

  private object PointXY {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case GraftScalar("st_point", Seq(x, y)) => Some((x, y))
      case _                                  => None
    }
  }

  private def derived(pred: Expression): Seq[Expression] = pred match {
    case GraftScalar("st_intersectsbox", Seq(PointXY(x, y), b0, b1, b2, b3)) =>
      (dLit(b0), dLit(b1), dLit(b2), dLit(b3)) match {
        case (Some(x0), Some(y0), Some(x1), Some(y1)) =>
          ranges(x, y, Envelope(x0, y0, x1, y1))
        case _ => Nil
      }

    case GraftScalar("st_dwithin", Seq(PointXY(x, y), g, d)) =>
      expanded(x, y, g, d)
    case GraftScalar("st_dwithin", Seq(g, PointXY(x, y), d)) =>
      expanded(x, y, g, d)

    case LessThan(GraftScalar("st_distance", Seq(PointXY(x, y), g)), d) =>
      expanded(x, y, g, d)
    case LessThan(GraftScalar("st_distance", Seq(g, PointXY(x, y))), d) =>
      expanded(x, y, g, d)
    case LessThanOrEqual(GraftScalar("st_distance", Seq(PointXY(x, y), g)), d) =>
      expanded(x, y, g, d)
    case LessThanOrEqual(GraftScalar("st_distance", Seq(g, PointXY(x, y))), d) =>
      expanded(x, y, g, d)
    case GreaterThan(d, GraftScalar("st_distance", Seq(PointXY(x, y), g))) =>
      expanded(x, y, g, d)
    case GreaterThan(d, GraftScalar("st_distance", Seq(g, PointXY(x, y)))) =>
      expanded(x, y, g, d)
    case GreaterThanOrEqual(d, GraftScalar("st_distance", Seq(PointXY(x, y), g))) =>
      expanded(x, y, g, d)
    case GreaterThanOrEqual(d, GraftScalar("st_distance", Seq(g, PointXY(x, y)))) =>
      expanded(x, y, g, d)

    case _ => Nil
  }

  private def expanded(x: Expression, y: Expression, g: Expression,
      d: Expression): Seq[Expression] =
    (foldEnvelope(g), dLit(d)) match {
      case (Some(env), Some(dist)) if dist >= 0 =>
        ranges(x, y, env.expand(dist))
      case _ => Nil
    }
}
