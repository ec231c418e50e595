package graft.expressions

import graft.SparkSpec
import graft.ms.MsTables
import graft.ops.{Flags, TimeAvg, VisAggregator}
import org.apache.spark.sql.functions._

/** The native TypedImperativeAggregate kernel must match the typed
  * Aggregator reference implementation bit-for-bit on the full fixture
  * MS — every output cell of DATA/FLAG/WEIGHT_SPECTRUM/SIGMA_SPECTRUM,
  * across both SPW shapes, both populations, and ragged channel tails.
  */
class VisAvgAggSpec extends SparkSpec {

  private def prepped(binSecs: Double) =
    TimeAvg.assignGrid(
      Flags.filterAutocorr(MsTables.main(spark))
        .withColumn("FROW", Flags.derivedFlagRow),
      binSecs)

  private def compare(chanBin: Int, useWs: Boolean, emitSs: Boolean): Unit = {
    val df = prepped(60000.0)
    val keys = TimeAvg.BinKey.map(col)
    def agg(c: org.apache.spark.sql.Column) =
      df.groupBy(keys: _*).agg(c.as("V")).select(keys :+ col("V.*"): _*)
    val ref = agg(VisAggregator.visAvg(useWs, emitSs)(
      col("FROW"), col("DATA"), col("FLAG"), col("WEIGHT_SPECTRUM"),
      col("SIGMA_SPECTRUM"), col("WEIGHT"), lit(chanBin)))
    val native = agg(VisAvgAgg(useWs, emitSs)(
      col("FROW"), col("DATA"), col("FLAG"), col("WEIGHT_SPECTRUM"),
      col("SIGMA_SPECTRUM"), col("WEIGHT"), lit(chanBin)))
    assert(ref.count() == native.count())
    // bit-exact: an inner join on EVERY column (including the nested
    // float matrices) must retain every row
    val joined = native.join(ref, native.columns.toSeq)
    assert(joined.count() == ref.count(),
      s"native kernel diverges from reference (chanBin=$chanBin, ws=$useWs, ss=$emitSs)")
  }

  test("matches the Aggregator bit-for-bit (chanBin 1, WS weights)") {
    compare(chanBin = 1, useWs = true, emitSs = true)
  }

  test("matches the Aggregator bit-for-bit (chanBin 4 ragged, WS weights)") {
    compare(chanBin = 3, useWs = true, emitSs = true)
  }

  test("matches the Aggregator bit-for-bit (WEIGHT fallback, no sigma)") {
    compare(chanBin = 4, useWs = false, emitSs = false)
  }

  test("native RowAvgAgg matches the row Aggregator bit-for-bit") {
    val df = prepped(60000.0)
    val keys = TimeAvg.BinKey.map(col)
    def agg(c: org.apache.spark.sql.Column) =
      df.groupBy(keys: _*).agg(c.as("R")).select(keys :+ col("R.*"): _*)
    val ref = agg(VisAggregator.rowAvg(
      col("TIME"), col("INTERVAL"), col("TIME_CENTROID"), col("EXPOSURE"),
      col("FROW"), col("UVW"), col("WEIGHT"), col("SIGMA")))
    val native = agg(RowAvgAgg(
      col("TIME"), col("INTERVAL"), col("TIME_CENTROID"), col("EXPOSURE"),
      col("FROW"), col("UVW"), col("WEIGHT"), col("SIGMA")))
    assert(ref.count() == native.count())
    val joined = native.join(ref, native.columns.toSeq)
    assert(joined.count() == ref.count(), "native row kernel diverges")
  }
}
