package graft.spark

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._

/** Spark-native extraction pipeline.
  *
  * The unit of parallelism is the document row: the pure JVM kernel
  * (graft.core) runs inside `mapPartitions` over a Catalyst-planned scan, so
  * column pruning / predicate pushdown stay fully effective on the input
  * table and everything cross-document (salting, metrics, resume) is plain
  * declarative Spark. Designed for 10^12-row Iceberg tables; tested on
  * parquet in local mode — the plan shape is identical.
  */
object Pipeline {

  /** Input row (BASELINE.json input_hint schema). */
  final case class PageRow(
      url: String,
      warc_ts: java.sql.Timestamp,
      html: Array[Byte],
      text: String,
      lang: String)

  /** Extraction result row: all-primitive fields -> Tungsten-friendly. */
  final case class ExtractedDoc(
      url: String,
      text: String,
      mode: String,      // pdf-tagged | pdf-geom | html | text | error
      ok: Boolean,
      error: String,
      pages: Int,
      chars: Int,
      kernelMicros: Long)

  /** Per-(partition) lineage row for the metrics sink (north-rule
    * "per-partition lineage + counters"). */
  final case class PartitionMetrics(
      partitionId: Int,
      docs: Long,
      okDocs: Long,
      pdfDocs: Long,
      htmlDocs: Long,
      textDocs: Long,
      errorDocs: Long,
      chars: Long,
      kernelMicros: Long)

  /** Maximum payload we attempt to parse (whole-file-in-memory kernel);
    * larger rows are counted as errors instead of risking executor OOM. */
  val MaxPayloadBytes: Int = 512 << 20

  /** The per-row kernel: format dispatch on the same codepath. */
  def extractRow(url: String, html: Array[Byte], textCol: String, geom: Boolean): ExtractedDoc = {
    val t0 = System.nanoTime()
    def done(mode: String, ok: Boolean, err: String, text: String, pages: Int): ExtractedDoc =
      ExtractedDoc(url, text, mode, ok, err, pages, if (text == null) 0 else text.length,
        (System.nanoTime() - t0) / 1000)
    try {
      val payload = if (html == null) Array.emptyByteArray else html
      if (payload.length > MaxPayloadBytes)
        done("error", ok = false, "payload too large", null, 0)
      else if (Html.looksLikePdf(payload)) {
        DocStructure.openDocument(payload, None) match {
          case Right(doc) =>
            val pages = DocStructure.pageRefs(doc).map(_.length).getOrElse(0)
            val r = if (geom) Extract.geomText(doc) else Extract.taggedText(doc)
            r match {
              case Right(text) => done(if (geom) "pdf-geom" else "pdf-tagged", ok = true, "", text, pages)
              case Left(e) => done("error", ok = false, e.render, null, pages)
            }
          case Left(e) => done("error", ok = false, e.render, null, 0)
        }
      } else if (Html.looksLikeHtml(payload)) {
        done("html", ok = true, "", Html.extractHtml(payload), 1)
      } else if (textCol != null) {
        done("text", ok = true, "", textCol, 1)
      } else {
        done("error", ok = false, "unrecognized payload", null, 0)
      }
    } catch {
      // the kernel is total by design; this is the last-resort guard so one
      // malformed document can never fail a 100 TB job's task
      case e: Throwable => done("error", ok = false,
        s"kernel exception: ${e.getClass.getSimpleName}", null, 0)
    }
  }

  /** Full extraction over an input dataframe with the input_hint schema.
    *
    * Scale notes: only (url, html, text) are selected -> Catalyst prunes the
    * scan to those columns; `mapPartitions` keeps JVM object reuse and the
    * per-document caches partition-local; no shuffle is introduced at all —
    * extraction is embarrassingly parallel and writes can stay
    * shuffle-free. Skew from giant PDFs is bounded by MaxPayloadBytes and
    * surfaced via kernelMicros in the metrics. Optional `saltPartitions`
    * redistributes rows by url hash (deterministic) when the source file
    * layout is skewed (e.g. crawl segments of wildly different row counts).
    */
  def extract(spark: SparkSession, input: DataFrame,
      geom: Boolean = false, saltPartitions: Int = 0): Dataset[ExtractedDoc] = {
    import spark.implicits._
    val pruned = input.select(col("url"), col("html"), col("text"))
    val redistributed =
      if (saltPartitions > 0) pruned.repartition(saltPartitions, pmod(xxhash64(col("url")), lit(saltPartitions)))
      else pruned
    redistributed
      .as[(String, Array[Byte], String)]
      .mapPartitions { iter =>
        iter.map { case (url, html, text) => extractRow(url, html, text, geom) }
      }
  }

  /** Per-partition lineage rows (append these to the metrics table). */
  def partitionMetrics(spark: SparkSession, ds: Dataset[ExtractedDoc]): Dataset[PartitionMetrics] = {
    import spark.implicits._
    ds.mapPartitions { iter =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var docs = 0L
      var okDocs = 0L
      var pdf = 0L
      var htmlD = 0L
      var textD = 0L
      var err = 0L
      var chars = 0L
      var micros = 0L
      for (d <- iter) {
        docs += 1
        if (d.ok) okDocs += 1
        d.mode match {
          case "pdf-tagged" | "pdf-geom" => pdf += 1
          case "html" => htmlD += 1
          case "text" => textD += 1
          case _ => err += 1
        }
        chars += d.chars
        micros += d.kernelMicros
      }
      Iterator.single(PartitionMetrics(pid, docs, okDocs, pdf, htmlD, textD, err, chars, micros))
    }
  }

  /** Checkpoint resume: drop rows whose url already exists in the done
    * table (idempotent re-runs; left-anti join is a shuffle on url — or a
    * broadcast when the remaining done-set is small). */
  def resumeRemaining(input: DataFrame, done: DataFrame): DataFrame =
    input.join(done.select("url").distinct(), Seq("url"), "left_anti")

  /** Per-page text rows (page-level query surface; `-p N` analogue). */
  final case class PageText(url: String, page: Int, text: String)

  def extractPages(spark: SparkSession, input: DataFrame): Dataset[PageText] = {
    import spark.implicits._
    input.select(col("url"), col("html"))
      .as[(String, Array[Byte])]
      .mapPartitions { iter =>
        iter.flatMap { case (url, html) =>
          val payload = if (html == null) Array.emptyByteArray else html
          if (!Html.looksLikePdf(payload)) Iterator.empty
          else DocStructure.openDocument(payload, None) match {
            case Right(doc) =>
              DocStructure.pageRefs(doc).getOrElse(Nil).iterator.zipWithIndex.map {
                case (ref, idx) =>
                  val txt = Interp.interpretPageItems(doc, ref) match {
                    case Right(items) => Layout.layoutPageText(Layout.defaultOptions, items)
                    case Left(_) => ""
                  }
                  PageText(url, idx + 1, txt)
              }
            case Left(_) => Iterator.empty
          }
        }
      }
  }

  /** Metadata/outline query surface (info/title/toc/trailer verbs). */
  final case class DocMeta(url: String, title: String, infoJson: String,
      trailerJson: String, pages: Int, tocEntries: Int, tocText: String)

  def extractMeta(spark: SparkSession, input: DataFrame): Dataset[DocMeta] = {
    import spark.implicits._
    input.select(col("url"), col("html"))
      .as[(String, Array[Byte])]
      .mapPartitions { iter =>
        iter.flatMap { case (url, html) =>
          val payload = if (html == null) Array.emptyByteArray else html
          if (!Html.looksLikePdf(payload)) Iterator.empty
          else DocStructure.openDocument(payload, None) match {
            case Right(doc) =>
              val toc = Metadata.toc(doc)
              Iterator.single(DocMeta(
                url,
                Metadata.title(doc).orNull,
                Metadata.infoJson(doc).orNull,
                Metadata.trailerJson(doc),
                Metadata.pageRefs(doc).length,
                toc.length,
                toc.map(e => (" " * e.depth) + e.title).mkString("\n")))
            case Left(_) => Iterator.empty
          }
        }
      }
  }
}
