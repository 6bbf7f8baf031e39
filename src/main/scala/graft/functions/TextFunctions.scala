package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression — SURVEY.md
  * §2.11 tier (b), same rationale as [[DotProduct]]: Spark ships no
  * normalization builtin, and a pre-training text pipeline MUST normalize
  * before hashing (L1/L2) or two byte-different spellings of the same
  * string ("é" composed vs "e"+U+0301 decomposed) dedup as distinct
  * documents. A Scala UDF would work but breaks whole-stage codegen and
  * pays SerDe per row; this expression stays inside the generated loop and
  * calls the JDK normalizer directly.
  *
  * Decomposed input is COMMON at corpus scale: macOS filesystem metadata,
  * some OCR output, and several Wikipedia dump eras emit NFD. DuckDB's
  * `nfc_normalize` is the oracle twin.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_nfc expects string, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(s: Any): Any =
    NfcNormalize.normalize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static helper shared by the interpreted and codegen paths (one
    * definition → bit-identical results on both). Fast path: NFC is a
    * no-op for pure-ASCII strings — `Normalizer.isNormalized` is a cheap
    * scan that avoids allocating for the overwhelmingly common case. */
  def normalize(s: UTF8String): UTF8String = {
    val j = s.toString
    if (Normalizer.isNormalized(j, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(j, Normalizer.Form.NFC))
  }
}

object TextFunctions {

  private val nfcIdent = FunctionIdentifier("graft_nfc")
  private val nfcInfo = new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc")
  private val nfcBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 1, "graft_nfc(str) takes exactly 1 argument")
    NfcNormalize(children.head)
  }

  /** Runtime registration (idempotent) — callers invoke before using
    * `expr("graft_nfc(s)")`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(nfcIdent, nfcInfo, nfcBuilder)

  /** Extension hook for cluster deployments (see [[GraftExtensions]]). */
  def inject(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((nfcIdent, nfcInfo, nfcBuilder))
}
