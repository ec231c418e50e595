package graft

import org.apache.spark.sql.SparkSession
import graft.ms.{MsTables, SyntheticMs}
import graft.ops.{Bda, Timechannel}

/** Prints the physical plans of the two pipeline hot paths and counts
  * their fact-table scans — the reproducible form of the plan audits
  * DESIGN.md cites. Usage: sbt "runMain graft.PlanAudit"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SyntheticMs.ensure(spark)

    def audit(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val plan = df.queryExecution.executedPlan.toString()
      val mainScans = plan.linesIterator
        .count(l => l.contains("FileScan") && l.contains("fixtures/ms/main"))
      // contains, not trim.startsWith: physical plan lines carry ":- +-"
      // tree art before the node name
      val exchanges = plan.linesIterator.count(l =>
        l.contains("Exchange hashpartitioning") ||
          l.contains("Exchange SinglePartition") ||
          l.contains("Exchange rangepartitioning"))
      val singleExch = plan.linesIterator
        .count(l => l.contains("Exchange SinglePartition"))
      println(s"== $name: main-table FileScans=$mainScans " +
        s"exchanges=$exchanges single-partition-exchanges=$singleExch")
      if (args.contains("-v")) println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExtendedMode))
    }

    audit("timechannel.averagedMain",
      Timechannel.averagedMain(MsTables.main(spark), Timechannel.Args(
        timeBinSecs = 60000.0, chanBinSize = 4,
        dataCols = Seq("DATA" -> "DATA"))))
    audit("bda.averagedMain",
      Bda.averagedMain(MsTables.main(spark), MsTables.spw(spark),
        MsTables.ddid(spark), Bda.Args()))

    // J2 cost adjudication (VERDICT r9 #7): the full E2 outMain write
    // plan — averaging + remap + output repartition, exactly what
    // Bda.run hands to the writer. The r9 refactor dropped the
    // cross-action persist, so the proof that the averaging shuffle
    // still runs ONCE is this plan containing a single aggregate over a
    // single fact scan (the A5/regenerate pre-pass reads the pruned
    // sizing frame, never the averaged table).
    locally {
      val args = graft.queries.BdaQueries.raggedArgs
      val main = MsTables.main(spark)
      val spw = MsTables.spw(spark); val ddid = MsTables.ddid(spark)
      val chanls = Bda.channelisationsSized(main, spw, ddid, args).collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSeq
      val (_, _, remapDf) = Bda.regenerate(spark, chanls, spw)
      val outMain = Bda.remap(Bda.averagedMain(main, spw, ddid, args), remapDf)
      val p = outMain.queryExecution.executedPlan.toString()
      val aggs = p.linesIterator.count(l =>
        l.contains("ObjectHashAggregate") && l.contains("graft_vis_avg"))
      audit("bda.run outMain (averaging+remap+write layout)", outMain)
      println(s"== bda.run outMain: graft_vis_avg aggregate nodes=$aggs (2 = one partial+final pair = ONE averaging shuffle)")
    }

    // LLM-pipeline sublinear paths: verify the joins the r7 changes
    // left to AQE plan sanely — no cartesian, no forced-broadcast hint
    // (the initial plan may show a shuffle join that AQE later demotes
    // to broadcast when the runtime size warrants; both are legal)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def auditPipeline(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val p = df.queryExecution.executedPlan.toString()
      val hints = df.queryExecution.analyzed.toString()
        .linesIterator.count(_.contains("ResolvedHint"))
      println(s"== $name: cartesian=${p.contains("CartesianProduct")} " +
        s"forced-hints=$hints " +
        s"single-partition-exchanges=${p.linesIterator.count(_.contains("Exchange SinglePartition"))}")
      if (args.contains("-v")) println(p)
    }
    val (ngOut, ngStaged) = graft.pipeline.Dedup.ngramJaccardPairsPlan(docs, 4, 3, 0.5)
    try auditPipeline("ngramJaccardPairs", ngOut)
    finally ngStaged.foreach(_.unpersist(blocking = false))
    auditPipeline("languageId", graft.pipeline.TextOps.languageId(docs))
    locally {
      import org.apache.spark.sql.functions.col
      auditPipeline("spanDedup", graft.pipeline.Dedup.spanDedup(docs, 8))
      auditPipeline("tfidfTopK", graft.pipeline.TextOps.tfidfTopK(docs, 5))
      val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      val customer = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      auditPipeline("bloomProbe", graft.pipeline.Sketches.bloomProbe(
        events.select(col("user_id")), col("user_id"),
        graft.pipeline.Sketches.bloomBits(
          customer.select(col("c_custkey")), col("c_custkey"))))
      auditPipeline("saltedJoin", graft.ops.SaltedJoin.join(
        events.select(col("event_id"), col("user_id")),
        customer.select(col("c_custkey"), col("c_name")),
        "user_id", "c_custkey", col("event_id"), 8))
    }

    // partition pruning on a WRITTEN output MS: a field selection must
    // show up as a PartitionFilter, not a data filter
    val out = "/tmp/graft_audit/tc_out"
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(out), true)
    Timechannel.run(spark, SyntheticMs.root, out, Timechannel.Args(
      timeBinSecs = 60000.0, chanBinSize = 4,
      dataCols = Seq("DATA" -> "DATA"), force = true, validate = false))
    val sel = spark.read.parquet(s"$out/main")
      .filter(org.apache.spark.sql.functions.col("FIELD_ID") === 0)
    val plan = sel.queryExecution.executedPlan.toString()
    val pruned = plan.contains("PartitionFilters: [") &&
      plan.linesIterator.exists(l =>
        l.contains("PartitionFilters") && l.contains("FIELD_ID"))
    println(s"== output-MS field selection partition-pruned: $pruned")
    spark.stop()
  }
}
