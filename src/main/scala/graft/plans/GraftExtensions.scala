package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** P6 `precision(x)` as a NATIVE Catalyst expression (reference
  * `src/utils/__init__.py:5-8`): decimal places of a numeric string after
  * stripping trailing zeros. Functionally identical to the column-expression
  * composition in [[graft.functions.Funcs.precisionOf]], but single-pass over
  * the bytes with `doGenCode`, so it stays inside whole-stage codegen with no
  * regex and no intermediate strings — the preferred extension tier when a
  * scalar can't be (or shouldn't be) composed from built-ins
  * (SURVEY §2.10 / §7.4).
  */
case class PrecisionOf(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"precision_of expects STRING, got ${child.dataType.sql}")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "precision_of"

  protected override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    PrecisionOf.precisionOf(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.PrecisionOf.precisionOf($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): PrecisionOf =
    copy(child = newChild)
}

object PrecisionOf {
  /** single pass: find '.', trim trailing '0', count the rest. */
  def precisionOf(s: String): Int = {
    val dot = s.indexOf('.')
    if (dot < 0) return 0
    var end = s.length
    while (end > dot + 1 && s.charAt(end - 1) == '0') end -= 1
    end - dot - 1
  }
}

/** `SparkSessionExtensions` hook: `spark.sql.extensions=graft.plans.GraftExtensions`
  * (or [[GraftExtensions.register]] on a live session) exposes the native
  * functions to SQL. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.precisionOfDescriptor)
    ext.injectFunction(GraftExtensions.bloomMightContainDescriptor)
  }
}

object GraftExtensions {
  val precisionOfDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("precision_of"),
    new ExpressionInfo(classOf[PrecisionOf].getName, "precision_of"),
    (children: Seq[Expression]) => PrecisionOf(children.head))

  /** Spark's native codegen'd Bloom probe (the expression behind its
    * runtime bloom-filter joins), surfaced as a callable function:
    * `bloom_might_contain(bloomBytes, xxhash64(value))`. The bloom binary
    * must be a constant (plan literal) — exactly how
    * [[graft.operators.Decontaminate.contaminatedDocsBloom]] ships the
    * benchmark sketch to every task. */
  val bloomMightContainDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bloom_might_contain"),
    new ExpressionInfo(
      classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
      "bloom_might_contain"),
    (children: Seq[Expression]) =>
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        children(0), children(1)))

  /** Imperative registration for sessions built without the config. */
  def register(spark: SparkSession): Unit = {
    Seq(precisionOfDescriptor, bloomMightContainDescriptor).foreach {
      case (id, info, builder) =>
        spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
  }
}
