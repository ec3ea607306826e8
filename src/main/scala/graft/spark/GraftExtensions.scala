package graft.spark

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
  * task failure), matching the pipeline's error-row behavior. */
case class ExtractText(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("extract_text requires a BINARY argument")
  override def prettyName: String = "extract_text"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val doc = Pipeline.extractRow("", bytes, null, geom = false)
    if (doc.ok && doc.text != null) UTF8String.fromString(doc.text) else null
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
