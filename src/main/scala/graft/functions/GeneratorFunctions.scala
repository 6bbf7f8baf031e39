package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst GENERATOR (UDTF tier of SURVEY.md §2.11) —
  * `graft_ngrams(tokens, n)` explodes a token array into its
  * space-joined n-grams, one output row per gram.
  *
  * The builtin composition (`explode(transform(sequence(0, size(t)-n),
  * i -> concat_ws(' ', slice(t, i+1, n))))`) is semantically identical
  * but MATERIALIZES the full n-gram array per row before exploding —
  * at 100 TB of documents that is one extra array allocation of the
  * document's own size per document, plus per-element interpreted
  * HigherOrderFunction lambda dispatch. A Generator emits rows lazily
  * off the ORIGINAL token array: no intermediate array, one UTF8String
  * built per gram, which is the shape the dedup/census pipelines
  * (l2c/l4h-style shingling) actually stream through their shuffles.
  *
  * Semantics match the builtin chain on every input the chain handles
  * sanely: a NULL array or NULL/invalid n yields zero rows
  * (explode-of-NULL), and a NULL token inside a gram renders as the
  * empty string the way `concat_ws` drops nulls. For size < n the
  * generator deliberately yields ZERO rows where the naive builtin
  * chain would not — `sequence(0, size-n)` with a negative stop
  * DESCENDS (default step -1), so the chain emits partial grams or
  * errors on the slice at start 0 unless the caller adds a
  * `size(toks) >= n` guard filter; the generator bakes that guard in
  * (l4r's census twin carries the guard explicitly for this reason).
  * Generators
  * run outside whole-stage codegen by design (every builtin explode
  * does too — the Generate operator is the iteration, CodegenFallback
  * only covers this expression's own eval). */
case class NGramsGenerator(left: Expression, right: Expression)
    extends BinaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_ngrams expects (array<string>, int), got ($l, $r)")
  }

  override def elementSchema: StructType =
    StructType(Seq(StructField("ngram", StringType, nullable = false)))

  override def prettyName: String = "graft_ngrams"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = left.eval(input)
    val nAny = right.eval(input)
    if (arr == null || nAny == null) return Iterator.empty
    val tokens = arr.asInstanceOf[ArrayData]
    val n = nAny.asInstanceOf[Int]
    if (n < 1 || tokens.numElements() < n) return Iterator.empty
    val last = tokens.numElements() - n
    (0 to last).iterator.map { i =>
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        if (!tokens.isNullAt(i + j)) sb.append(tokens.getUTF8String(i + j).toString)
        j += 1
      }
      InternalRow(UTF8String.fromString(sb.toString))
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NGramsGenerator =
    copy(left = newLeft, right = newRight)
}

object GeneratorFunctions {

  private val ident = FunctionIdentifier("graft_ngrams")
  private val info = new ExpressionInfo(classOf[NGramsGenerator].getName, "graft_ngrams")
  private val builder: Seq[Expression] => Expression = { children =>
    require(children.size == 2, "graft_ngrams(tokens, n) takes exactly 2 arguments")
    NGramsGenerator(children.head, children(1))
  }

  /** Runtime registration (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)

  /** Extension hook — see [[GraftExtensions]]. */
  def inject(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((ident, info, builder))
}
