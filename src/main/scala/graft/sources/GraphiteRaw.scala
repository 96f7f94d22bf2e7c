package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Point

/** Parser for Graphite's `raw` render format (S3): the reference engine
  * parsed Graphite render output with a treetop PEG grammar (reference
  * Gemfile.lock:169); our store is parquet so this is only needed to
  * ingest fixtures/exports, but the format support is part of the
  * operator surface.
  *
  * Format, one series per line:
  *   `name,start,end,step|v1,v2,None,v4,...`
  * start/end are epoch seconds, step in seconds, `None` marks an empty
  * bucket (null value — SURVEY §2.4 null rules).
  */
object GraphiteRaw {

  final case class RawSeries(metric: String, startEpoch: Long, endEpoch: Long,
      stepSeconds: Long, values: Seq[Option[Double]])

  def parseLine(line: String): Either[String, RawSeries] = {
    val bar = line.indexOf('|')
    if (bar < 0) return Left(s"no '|' in: $line")
    val header = line.substring(0, bar).split(",")
    if (header.length != 4) return Left(s"bad header (need name,start,end,step): $line")
    try {
      val vals = line.substring(bar + 1).split(",", -1).toIndexedSeq.map {
        case "" | "None" | "none" | "null" => None
        case v => Some(v.trim.toDouble)
      }
      Right(RawSeries(header(0).trim, header(1).trim.toLong, header(2).trim.toLong,
        header(3).trim.toLong, vals))
    } catch {
      case e: NumberFormatException => Left(s"bad number in '$line': ${e.getMessage}")
    }
  }

  /** Parsed lines → long-format (metric, ts, value) DataFrame — the
    * same shape as the metric store, densified on the declared step
    * grid (bucket i is at start + i*step). */
  def toDataFrame(spark: SparkSession, lines: Seq[String]): DataFrame = {
    import spark.implicits._
    val series = lines.filter(_.nonEmpty).map(l =>
      parseLine(l).fold(err => throw new IllegalArgumentException(err), identity))
    val rows = series.flatMap { s =>
      s.values.zipWithIndex.map { case (v, i) =>
        (s.metric, new Timestamp((s.startEpoch + i * s.stepSeconds) * 1000L), v)
      }
    }
    rows.toDF("metric", "ts", "value")
      .withColumn("value", col("value").cast("double"))
  }

  /** Render a long-format frame back to raw lines (round-trip support,
    * driver-side: intended for small fixture exports only). */
  def render(df: DataFrame): Seq[String] = {
    val rows = df.orderBy("metric", "ts").collect()
    rows.groupBy(_.getString(0)).toSeq.sortBy(_._1).map { case (metric, rs) =>
      val ts = rs.map(_.getTimestamp(1).getTime / 1000)
      val step = if (ts.length > 1) ts(1) - ts(0) else 60L
      val vals = rs.map(r => if (r.isNullAt(2)) "None" else r.getDouble(2).toString)
      s"$metric,${ts.head},${ts.last + step},$step|${vals.mkString(",")}"
    }
  }
}
