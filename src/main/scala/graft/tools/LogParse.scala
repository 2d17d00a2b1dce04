package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** T17 — resource-log line parsing into typed columns, the Spark form of
  * the reference's `utils-dev/resource_to_excel.py:9-22` (regex split →
  * strip `Mi`/`m` suffixes → numeric + datetime casts).
  *
  * Expected line shape:
  * `2026-01-09 12:00:01 INFO pod-name-abc 512Mi 250m some message`
  */
object LogParse {

  private val pattern =
    """^(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}) (\w+) (\S+) (\d+)Mi (\d+)m (.*)$"""

  /** Parse `lineCol` into (ts, level, pod, memory_mib, cpu_millis,
    * message); unparseable lines surface with null fields + the raw line
    * kept for DLQ routing.
    */
  def parse(df: DataFrame, lineCol: String): DataFrame = {
    def grp(i: Int): Column = regexp_extract(col(lineCol), pattern, i)
    df.select(
      col(lineCol).as("raw"),
      when(grp(1) =!= "", to_timestamp(grp(1))).as("ts"),
      when(grp(2) =!= "", grp(2)).as("level"),
      when(grp(3) =!= "", grp(3)).as("pod"),
      when(grp(4) =!= "", grp(4).cast("long")).as("memory_mib"),
      when(grp(5) =!= "", grp(5).cast("long")).as("cpu_millis"),
      when(grp(6) =!= "", grp(6)).as("message"))
  }
}
