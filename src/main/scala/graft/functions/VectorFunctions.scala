package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the embedding dot product — SURVEY.md
  * §2.11 tier (b): the one hot-path where builtin primitives fall short.
  *
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)` is semantically right but
  * executes the lambda per element through interpreted HigherOrderFunction
  * machinery; this expression compiles to a tight primitive loop inside
  * whole-stage codegen. Semantics are IDENTICAL — left-to-right double
  * accumulation over float elements cast exactly to double — so results
  * (and the DuckDB oracles that mirror that fold) stay bit-for-bit equal.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (array<float>, array<float>), got ($l, $r)")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  // Matches the builtin aggregate(zip_with(a,b,_*_),0d,_+_) fold on every
  // input, including the degenerate ones: a length mismatch or a null
  // element yields NULL (zip_with pads the shorter side with nulls and
  // null poisons the sum), never a plausible-looking partial dot product.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {

  private val dotIdent = FunctionIdentifier("graft_dot")
  private val dotInfo = new ExpressionInfo(classOf[DotProduct].getName, "graft_dot")
  private val dotBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 2, "graft_dot(arrayA, arrayB) takes exactly 2 arguments")
    DotProduct(children.head, children(1))
  }

  /** Runtime registration (idempotent) — callers invoke before using
    * `expr("graft_dot(a, b)")`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(dotIdent, dotInfo, dotBuilder)

  /** Extension hook for cluster deployments:
    * `--conf spark.sql.extensions=graft.functions.GraftExtensions`. */
  def inject(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((dotIdent, dotInfo, dotBuilder))
}

/** SparkSessionExtensions entry point registering graft's native
  * functions at session build time. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    VectorFunctions.inject(ext)
    TextFunctions.inject(ext)
    GeneratorFunctions.inject(ext)
  }
}
