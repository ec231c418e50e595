package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.EventStream.FunnelEvent

/** Randomized equivalence evidence for the streaming funnel:
  *
  *  A. (pure, 400 cases) the reach vector is a SUFFICIENT STATISTIC —
  *     folding [[EventStream.advanceReach]] over ANY time-ordered
  *     split of an event log lands on the same vector as one
  *     whole-log batch. Small value domains force heavy tu/step
  *     collisions, the regime where an order-sensitivity bug would
  *     show.
  *  B. (Spark, sampled cases) the pure model equals the batch window
  *     composition [[graft.ops.EventOps.funnel]] — anchoring A's
  *     reference to the production batch plan.
  *
  * Deterministic seed: failures reproduce exactly.
  */
class FunnelPropertySpec extends SparkSpec {
  import spark.implicits._

  private val NSteps = 3
  private val rnd = new scala.util.Random(20260814L)

  private def randomLog(): Seq[FunnelEvent] = {
    val n = 1 + rnd.nextInt(24)
    (0 until n).map { i =>
      FunnelEvent(user_id = 1L + rnd.nextInt(3),
        event_id = i.toLong, tu = rnd.nextInt(12).toLong,
        step = rnd.nextInt(NSteps), flush = false)
    }
  }

  private def wholeLog(events: Seq[FunnelEvent],
                       gap: Option[Long]): Map[Long, Seq[Long]] =
    events.groupBy(_.user_id).map { case (u, es) =>
      val reach = Array.fill(NSteps)(-1L)
      EventStream.advanceReach(reach, es.toArray, gap)
      u -> reach.toSeq
    }

  test("A: reach vector is sufficient across any time-ordered batching") {
    (1 to 400).foreach { _ =>
      val log = randomLog()
      val gap = if (rnd.nextBoolean()) None else Some(1L + rnd.nextInt(6))
      val whole = wholeLog(log, gap)
      // split the (tu, event_id)-sorted log at random boundaries —
      // exactly the file-staging delivery contract
      val sorted = log.sortBy(e => (e.tu, e.event_id))
      val nCuts = rnd.nextInt(4)
      val cuts = (Seq(0, sorted.size) ++
        Seq.fill(nCuts)(rnd.nextInt(sorted.size + 1))).distinct.sorted
      val chunks = cuts.zip(cuts.tail).map { case (a, b) => sorted.slice(a, b) }
      val folded = log.map(_.user_id).distinct.map { u =>
        val reach = Array.fill(NSteps)(-1L)
        chunks.foreach(c =>
          EventStream.advanceReach(reach,
            c.filter(_.user_id == u).toArray, gap))
        u -> reach.toSeq
      }.toMap
      assert(folded == whole,
        s"split=$cuts gap=$gap log=$log")
    }
  }

  test("B: pure model ≡ batch EventOps.funnel on sampled random logs") {
    val steps = Seq("s0", "s1", "s2")
    (1 to 3).foreach { _ =>
      val log = randomLog()
      val gap = if (rnd.nextBoolean()) None else Some(3L)
      val df = log.map(e => (e.user_id, e.event_id, e.tu, s"s${e.step}"))
        .toDF("user_id", "event_id", "us", "event_type")
        .select(col("user_id"), col("event_id"),
          timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"),
          col("event_type"))
      val batch = graft.ops.EventOps.funnel(df, steps, gap)
        .collect().map { r =>
          r.getAs[Long]("user_id") -> (1 to NSteps).map { k =>
            Option(r.get(r.fieldIndex(s"s${k}_us")))
              .map(_.asInstanceOf[Long]).getOrElse(-1L)
          }
        }.toMap
      val model = wholeLog(log, gap).filter(_._2.head >= 0)
      assert(batch == model, s"gap=$gap log=$log")
    }
  }
}
