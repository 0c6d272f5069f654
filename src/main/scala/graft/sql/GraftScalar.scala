package graft.sql

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.DataType
import org.apache.spark.sql.GraftInterop.AbsType

/** One expression class for the whole scalar function library.
  *
  * The function is identified by name and resolved against the static spec
  * table in [[GraftDefs]]; only the name and children are serialized to
  * executors, and plan canonicalization/equality stay structural.
  *
  * Codegen: children are code-generated normally (so projections/filters
  * around graft calls stay inside whole-stage codegen) and the kernel is
  * invoked through a per-instance Spec reference resolved once by name at
  * generated-class init — not per row, and nothing is serialized for it.
  */
case class GraftScalar(fname: String, children: Seq[Expression])
    extends Expression with ImplicitCastInputTypes {

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

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // hold the kernel as a Function1 resolved once by name at generated-class
    // init (GraftDefs has a static forwarder; Spec.eval is a function field)
    val specVar = ctx.addMutableState("scala.Function1", "graftKernel",
      v => s"""$v = graft.sql.GraftDefs.byName("$fname").eval();""")
    val evals = children.map(_.genCode(ctx))
    val args = ctx.freshName("graftArgs")
    val anyNull = ctx.freshName("graftAnyNull")
    val resultObj = ctx.freshName("graftResult")
    val javaType = CodeGenerator.javaType(dataType)
    val unbox = dataType match {
      case t if CodeGenerator.isPrimitiveType(t) =>
        s"((${CodeGenerator.boxedType(t)}) $resultObj).${javaType}Value()"
      case _ => s"($javaType) $resultObj"
    }
    val childCode = evals.zipWithIndex.map { case (e, i) =>
      s"""
         |${e.code}
         |if (!$anyNull) {
         |  if (${e.isNull}) { $anyNull = true; } else { $args[$i] = ${e.value}; }
         |}
       """.stripMargin
    }.mkString("\n")
    ev.copy(code =
      code"""
         |boolean $anyNull = false;
         |Object[] $args = new Object[${children.length}];
         |$childCode
         |boolean ${ev.isNull} = true;
         |$javaType ${ev.value} = ${CodeGenerator.defaultValue(dataType)};
         |if (!$anyNull) {
         |  Object $resultObj = $specVar.apply($args);
         |  if ($resultObj != null) {
         |    ${ev.isNull} = false;
         |    ${ev.value} = $unbox;
         |  }
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
