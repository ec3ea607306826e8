package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: pins the exact semantics of the Catalyst primitives the
  * round-7 compiled kernels must replicate (ascii() on non-ASCII input,
  * split trailing-empty behavior, sequence(1,0), substring at pos 0,
  * round() HALF_UP). Output is read by a human; the durable pins live in
  * KernelParitySpec. */
object SemanticsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .appName("semantics-probe").config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = Seq("a", "é", "日", "😀", "", "  x  y ", "x y").toDF("s")
    df.select(col("s"), ascii(col("s")).as("ascii"),
      length(col("s")).as("len"),
      split(col("s"), "\\s+").as("split")).show(false)
    Seq(("abc")).toDF("t").select(
      sequence(lit(1), lit(0)).as("seq10"),
      substring(col("t"), 0, 3).as("sub0"),
      substring(col("t"), 1, 3).as("sub1")).show(false)
    // ascii of each codepoint of a multibyte string, via the tokenHash path
    val tok = Seq("aé日").toDF("tok")
    tok.select(transform(sequence(lit(1), length(col("tok"))),
      i => ascii(substring(col("tok"), i, lit(1)))).as("codes")).show(false)
    spark.stop()
  }
}
