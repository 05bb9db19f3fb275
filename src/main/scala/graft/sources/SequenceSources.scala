package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sequence-file readers for the assembly-side inputs (FASTA/FASTQ) —
  * the ingest formats of the reference's domain — built on Spark's
  * distributed text reader, not driver-side parsing.
  */
object SequenceSources {

  /** FASTA: records delimited by '>'. Setting the record separator to
    * ">" makes each record one row regardless of how many lines the
    * sequence wraps over, so the parse is embarrassingly parallel (no
    * global line-order window).
    * Output: (seq_id, description, sequence, length).
    */
  def readFasta(spark: SparkSession, path: String): DataFrame =
    spark.read.option("lineSep", ">").text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(
        regexp_extract(col("value"), "^(\\S+)", 1).as("seq_id"),
        trim(regexp_extract(col("value"), "^\\S+[ \\t]*([^\\n]*)", 1)).as("description"),
        regexp_replace(regexp_replace(col("value"), "^[^\\n]*\\n", ""), "\\s", "")
          .as("sequence"))
      .withColumn("length", length(col("sequence")).cast("long"))

  /** FASTQ: rigid 4-line records (@id / seq / + / qual). Needs global
    * line indices, so this uses zipWithIndex (one count pass + one
    * data pass — inherent to the format's line-position semantics; at
    * scale prefer pre-split FASTQ or FASTA). Records that straddle a
    * partition boundary are stitched by one `aggregateByKey` with a
    * fixed 4-slot array — bounded state per record, no growing-Seq
    * concatenation, and record-local (never whole-file) memory.
    * Output: (seq_id, sequence, quality, length).
    */
  def readFastq(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val grouped = spark.read.text(path).select("value").as[String].rdd
      .zipWithIndex()
      .map { case (l, i) => (i / 4, (i % 4, l)) }
      .aggregateByKey(new Array[String](4))(
        (acc, pl) => { acc(pl._1.toInt) = pl._2; acc },
        (a, b) => { var i = 0; while (i < 4) { if (a(i) == null) a(i) = b(i); i += 1 }; a })
      .map { case (rec, m) =>
        (rec, Option(m(0)).getOrElse("").stripPrefix("@"),
          Option(m(1)).getOrElse(""), Option(m(3)).getOrElse(""))
      }
    grouped.toDF("record", "seq_id", "sequence", "quality")
      .select(col("seq_id"), col("sequence"), col("quality"),
        length(col("sequence")).cast("long").as("length"))
  }

  /** BED-style interval files (chrom, start, end[, name, score]):
    * tab-separated, 0-based half-open intervals, '#'/track/browser
    * header lines skipped — the genomics region format every
    * coverage/annotation pipeline exchanges. Plain distributed CSV
    * read (splittable, pushdown-friendly); missing optional columns
    * come back NULL. Output: (chrom, start, end, name, score) with
    * `span` = end − start.
    */
  def readBed(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read
      .option("sep", "\t").option("comment", "#")
      .schema("chrom STRING, start BIGINT, end BIGINT, name STRING, score BIGINT")
      .csv(path)
    raw.filter(!col("chrom").isin("track", "browser") && col("start").isNotNull)
      .withColumn("span", col("end") - col("start"))
  }

  /** Canonical DNA utilities as columns (codegen'd built-ins). */
  def reverseComplement(seq: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    translate(reverse(upper(seq)), "ACGT", "TGCA")

  def gcContent(seq: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val up = upper(seq)
    (length(up) - length(translate(up, "GC", ""))).cast("double") / length(up)
  }

  /** 3'-end quality trimming — the standard FASTQ preprocessing step:
    * drop the read's trailing bases whose phred score (ASCII − 33)
    * is below `minPhred`, i.e. keep up to the LAST base meeting the
    * threshold. Pure per-row declarative expressions (no UDF, stays
    * in codegen); a read with no qualifying base trims to empty.
    * Input df needs (`seqCol`, `qualCol`) as produced by
    * [[readFastq]].
    */
  def trimLowQuality(df: org.apache.spark.sql.DataFrame, seqCol: String,
                     qualCol: String, minPhred: Int): org.apache.spark.sql.DataFrame =
    df.withColumn("__keep", expr(
        s"""coalesce(array_max(transform(sequence(1, greatest(length($qualCol), 1)),
           |  i -> CASE WHEN ascii(substring($qualCol, i, 1)) - 33 >= $minPhred
           |       THEN i ELSE 0 END)), 0)""".stripMargin))
      .withColumn("trimmed_seq", expr(s"substring($seqCol, 1, __keep)"))
      .withColumn("trimmed_qual", expr(s"substring($qualCol, 1, __keep)"))
      .withColumn("trimmed_length", col("__keep").cast("long"))
      .drop("__keep")
}
