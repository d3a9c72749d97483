package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Guard for the sessionize/funnel state keys: their state stores key on
  * user_id, so a hot user (≥ ~1% of rows) would concentrate one state
  * partition's load and call for salting the state key. The corpus is
  * measured here, not assumed — when a regenerated events table trips
  * this, salt the sessionize key (user_id, hash(user_id) % S) and merge
  * sessions across salt lanes in a second pass. */
class EventsSkewSpec extends SparkSpec {

  test("hottest event user is within 3x the mean user load (salting not needed)") {
    val per = graft.Tables.events(spark, SfDir)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .agg(max(col("n")).as("mx"), sum(col("n")).as("tot"),
        count(lit(1)).as("users")).head()
    val (mx, tot, users) = (per.getLong(0), per.getLong(1), per.getLong(2))
    val ratio = mx.toDouble / (tot.toDouble / users)
    assert(ratio < 3.0,
      f"hottest user holds $mx rows = $ratio%.1fx the mean user load — " +
        "salt the sessionize/funnel state keys before trusting per-user " +
        "state balance (measured at sf0.1: 1.5x)")
  }
}
