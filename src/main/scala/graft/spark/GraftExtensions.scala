package graft.spark

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: extract_text(binary) -> string.
  *
  * The mapPartitions pipeline stays the production path (it keeps the
  * per-partition memoization and metrics hooks); this expression is the SQL
  * ergonomics escape hatch from SURVEY.md §7.3 — extraction composes with
  * arbitrary SQL (`SELECT url, extract_text(html) FROM crawl WHERE ...`)
  * and Catalyst can fuse the surrounding projection/filters. Evaluation is
  * a pure kernel call per row; null/malformed input yields null (never a
  * task failure), matching the pipeline's error-row behavior.
  *
  * Implements `doGenCode` (no CodegenFallback): the generated code calls
  * the kernel through a referenced object, so the surrounding projection
  * and filters stay inside ONE WholeStageCodegen stage instead of falling
  * back to interpreted per-row evaluation around this expression. */
case class ExtractText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("extract_text requires a BINARY argument")
  override def prettyName: String = "extract_text"

  /** Kernel call shared by interpreted eval and generated code. */
  def evalBytes(bytes: Array[Byte]): UTF8String = {
    val doc = Pipeline.extractRow("", bytes, null, geom = false)
    if (doc.ok && doc.text != null) UTF8String.fromString(doc.text) else null
  }

  override protected def nullSafeEval(input: Any): Any =
    evalBytes(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("extractText", this, classOf[ExtractText].getName)
    val r = ctx.freshName("extractTextR")
    nullSafeCodeGen(ctx, ev, c => s"""
      org.apache.spark.unsafe.types.UTF8String $r = $self.evalBytes($c);
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $r; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): ExtractText =
    copy(child = newChild)
}

/** Session extension installing the extraction function into the registry:
  * `--conf spark.sql.extensions=graft.spark.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("extract_text"),
      new ExpressionInfo(classOf[ExtractText].getName, "extract_text"),
      (children: Seq[Expression]) => ExtractText(children.head)))
  }
}

object GraftExtensions {
  /** Register extract_text on an ALREADY-BUILT session (extensions via
    * spark.sql.extensions only apply at session construction; a shared
    * session — notebook, Verify — installs it post hoc). Idempotent. */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("extract_text"),
      new ExpressionInfo(classOf[ExtractText].getName, "extract_text"),
      (children: Seq[Expression]) => ExtractText(children.head))
}
