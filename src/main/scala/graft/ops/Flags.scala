package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Flag and selection operators (SURVEY §2.2 P1–P4, P7).
  *
  * All are native Catalyst expressions (higher-order functions, no UDFs)
  * so they stay inside whole-stage codegen and push down where possible.
  */
object Flags {

  /** P1 — drop autocorrelations (reference default; TAQL
    * `ANTENNA1 != ANTENNA2`, xova/apps/xova/arguments.py:219-220).
    * A plain filter: Catalyst pushes it into the parquet scan.
    */
  def filterAutocorr(df: DataFrame): DataFrame =
    df.filter(col("ANTENNA1") =!= col("ANTENNA2"))

  /** P2 — field selection (xova/apps/xova/averaging.py:218-219). */
  def selectFields(df: DataFrame, fields: Seq[Int]): DataFrame =
    if (fields.isEmpty) df else df.filter(col("FIELD_ID").isin(fields: _*))

  /** P2 name resolution — "-f 3C147" style specs resolve names to ids
    * against the FIELD subtable (xova/apps/xova/arguments.py:12-24; the
    * tiny semi-join of SURVEY §2.4). Driver-side: #fields rows.
    */
  def resolveFields(sel: Seq[Either[Int, String]], field: DataFrame): Seq[Int] = {
    val names = sel.collect { case Right(n) => n }
    val byName =
      if (names.isEmpty) Nil
      else field.filter(col("NAME").isin(names: _*))
        .select("FIELD_ID").collect().map(_.getInt(0)).toSeq
    (sel.collect { case Left(i) => i } ++ byName).distinct.sorted
  }

  /** P3 — scan selection (xova/apps/xova/averaging.py:221-222). */
  def selectScans(df: DataFrame, scans: Seq[Int]): DataFrame =
    if (scans.isEmpty) df else df.filter(col("SCAN_NUMBER").isin(scans: _*))

  /** P4 — FLAG_ROW := all(FLAG over chan,corr) unless the caller asked to
    * respect the stored column (xova/apps/xova/averaging.py:224-225).
    * `forall(flatten(...))` is a codegen'd higher-order expression — no
    * explode, no shuffle.
    */
  def deriveFlagRow(df: DataFrame, respectFlagRow: Boolean = false): DataFrame =
    if (respectFlagRow) df
    else df.withColumn("FLAG_ROW", derivedFlagRow)

  /** The P4 expression itself (usable in selects). */
  def derivedFlagRow: Column = forall(flatten(col("FLAG")), x => x)

  /** P7 — FLAG_CATEGORY = FLAG with a singleton leading category axis
    * (xova/apps/xova/averaging.py:80-94).
    */
  def flagCategory(df: DataFrame): DataFrame =
    df.withColumn("FLAG_CATEGORY", array(col("FLAG")))

  /** P8 — channel selection (parsed by the reference at
    * arguments.py:42-74; applied here as a native array slice of every
    * (chan, corr) matrix column). `channels` are 0-based kept indices
    * (graft.cli.Arguments.expandChannels); indices beyond a column's
    * channel count are ignored, so mixed-SPW frames work.
    */
  def selectChannels(df: DataFrame, channels: Seq[Int],
                     matrixCols: Seq[String]): DataFrame =
    if (channels.isEmpty) df
    else {
      val kept = array(channels.map(lit): _*)
      matrixCols.foldLeft(df) { (d, c) =>
        d.withColumn(c, transform(
          filter(kept, i => i < size(col(c))),
          i => element_at(col(c), i + 1)))
      }
    }
}
