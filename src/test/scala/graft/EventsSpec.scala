package graft

import org.apache.spark.sql.functions._
import graft.queries.Analytics

/** Behavior specs for the event-sequence analytics added in round 13:
  * the ordered conversion funnel and the Markov transition matrix. */
class EventsSpec extends SparkSpec {

  test("ordered funnel: stages monotone non-increasing, strict ordering enforced") {
    val rows = Analytics.queries("events_funnel_ordered")(spark, sf0001)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(rows.keySet == Set(1, 2, 3))
    assert(rows(1) >= rows(2) && rows(2) >= rows(3),
      s"funnel not monotone: $rows")
    assert(rows(1) > 0, "no users entered the funnel at sf0.001")
    // independent recompute for one stage: users with a click strictly
    // after their first view
    val e = graft.streaming.StreamingUpsert
      .eventFeed(Tables.load(spark, sf0001, "events"))
      .select(col("user_id"), col("event_type"),
        unix_micros(col("event_time")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val firstView = e.filter(_._2 == "view").groupBy(_._1)
      .map { case (u, xs) => u -> xs.map(_._3).min }
    val stage2 = e.filter(_._2 == "click")
      .count(x => firstView.get(x._1).exists(x._3 > _)) // click rows
    val users2 = e.filter(_._2 == "click")
      .filter(x => firstView.get(x._1).exists(x._3 > _))
      .map(_._1).distinct.length
    assert(rows(2).toInt == users2,
      s"stage-2 user count ${rows(2)} != recomputed $users2 " +
        s"($stage2 qualifying click rows)")
  }

  test("markov transitions: row-stochastic within rounding, counts conserve") {
    val rows = Analytics.queries("events_markov_transitions")(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(rows.nonEmpty)
    // probabilities per source row sum to ~1 (each p rounded to 4dp,
    // <= 5 destinations -> max drift 5 * 5e-5)
    rows.groupBy(_._1).foreach { case (from, g) =>
      val s = g.map(_._4).sum
      assert(math.abs(s - 1.0) <= 3e-4, f"row $from sums to $s%.5f")
    }
    // transition count total == events total - one per user with >= 1
    // event (the last event of every user has no successor)
    val feed = graft.streaming.StreamingUpsert
      .eventFeed(Tables.load(spark, sf0001, "events"))
    val nEvents = feed.count()
    val nUsers = feed.select("user_id").distinct().count()
    assert(rows.map(_._3).sum == nEvents - nUsers)
  }
}
