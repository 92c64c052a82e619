package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, EmptyBlock, ExprCode, FalseLiteral, JavaCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The child's catalog type name as a non-null string constant.
  *
  * Spark's own `TypeOf` serves the same purpose, but its codegen splices
  * the type name into the generated Java UNQUOTED, so any plan compiled
  * before ConstantFolding has collapsed it (eager expression-evaluation
  * paths, spec harnesses) fails codegen and falls back to the
  * interpreter. The name is fixed once the child resolves, so this
  * expression emits a bound constant reference instead — and, being
  * foldable, still collapses to a plain Literal in optimized plans. The
  * child is never evaluated.
  */
case class TypeNameOf(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def foldable: Boolean = true
  override def eval(input: InternalRow): Any =
    UTF8String.fromString(child.dataType.catalogString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("typeName",
      UTF8String.fromString(child.dataType.catalogString))
    ev.copy(code = EmptyBlock, isNull = FalseLiteral,
      value = JavaCode.global(ref, dataType))
  }
  override protected def withNewChildInternal(c: Expression): TypeNameOf =
    copy(child = c)
  override def prettyName: String = "type_name_of"
}
