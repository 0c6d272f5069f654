package graft.sql

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.DataType
import org.apache.spark.sql.GraftInterop.AbsType

/** One expression class for the whole scalar function library.
  *
  * The function is identified by name and resolved against the static spec
  * table in [[GraftDefs]]; only the name and children are serialized to
  * executors, and plan canonicalization/equality stay structural. All specs
  * are CodegenFallback in v1 (interpreted eval inside whole-stage-codegen'd
  * pipelines); hot-path candidates get `doGenCode` in a later round.
  */
case class GraftScalar(fname: String, children: Seq[Expression])
    extends Expression with ImplicitCastInputTypes with CodegenFallback {

  @transient private lazy val spec: GraftDefs.Spec = GraftDefs.byName(fname)

  override def prettyName: String = fname
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  // geometry kernels are pure: literal-argument calls (bbox/mask/query-point
  // geometries) constant-fold at plan time, which also lets optimizer rules
  // read their envelopes (see SpatialFilterPushdown)
  override def foldable: Boolean = children.forall(_.foldable)
  override def dataType: DataType = spec.out
  override def inputTypes: Seq[AbsType] = spec.in

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (children.length != spec.in.length)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$fname expects ${spec.in.length} arguments, got ${children.length}")
    else super.checkInputDataTypes()
  }

  override def eval(input: InternalRow): Any = {
    val n = children.length
    val vals = new Array[Any](n)
    var i = 0
    while (i < n) {
      val v = children(i).eval(input)
      if (v == null) return null
      vals(i) = v
      i += 1
    }
    spec.eval(vals)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
