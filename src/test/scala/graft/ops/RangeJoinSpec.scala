package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Property check for the bucketed range-join rewrite: on random event
  * sets it must produce exactly the pairs of the naive theta join —
  * including events sitting right on bucket boundaries and at exactly
  * the window width (the ≤ is inclusive). */
class RangeJoinSpec extends SparkSuite {
  import spark.implicits._

  test("bucketed rewrite equals the naive theta join on random events") {
    val rnd = new scala.util.Random(11)
    val W = 600L * 1000000L
    for (trial <- 1 to 5) {
      val rows = (1 to 120).map { i =>
        // cluster timestamps so windows overlap often; include exact
        // multiples of W to hit bucket boundaries
        val base = rnd.nextInt(4).toLong * W
        val jitter = rnd.nextInt(5) match {
          case 0 => 0L                      // exactly on a boundary
          case 1 => W                       // exactly one window away
          case _ => (rnd.nextDouble() * 2 * W).toLong
        }
        (rnd.nextInt(6).toLong, i.toLong, base + jitter)
      }
      val e = rows.toDF("user_id", "event_id", "us")
      val naive = e.as("a").join(e.as("b"),
          col("a.user_id") === col("b.user_id") &&
            col("a.event_id") < col("b.event_id") &&
            abs(col("b.us") - col("a.us")) <= W)
        .select(col("a.user_id"), col("a.event_id").as("e1"),
          col("b.event_id").as("e2"))
        .as[(Long, Long, Long)].collect().toSet
      val bucketed = Joins.rangePairs(e, W)
        .select(col("user_id"), col("e1"), col("e2"))
        .as[(Long, Long, Long)].collect().toSet
      assert(bucketed === naive, s"trial $trial diverged")
    }
  }
}
