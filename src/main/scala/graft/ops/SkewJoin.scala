package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join (100 TB design rule, SURVEY.md §7.3).
  *
  * A shuffled join hashes both sides on the key: one dominant key value
  * sends its entire row population to a single task, which then runs as
  * long as the whole rest of the stage combined. Spark's AQE skew-join
  * split handles this when both sides are shuffle outputs, but not every
  * shape qualifies (e.g. a replicated/broadcast-ineligible small side,
  * or a skewed key feeding a downstream aggregation that pins the
  * partitioning). Salting is the explicit fix:
  *
  *  - the BIG side appends a salt in [0, n) — any per-row value works,
  *    since the salt only has to spread rows, never to be stable across
  *    datasets; we hash the whole row so identical rows at least spread
  *    by their other columns;
  *  - the SMALL side is replicated n times, once per salt value
  *    (explode of a literal sequence — n× the small side, a cost you pay
  *    only when you opt in);
  *  - the join key becomes (key, salt), so the hot key's rows fan out
  *    over n tasks instead of one.
  *
  * Result is row-identical to `big.join(small, key)` for inner joins:
  * every (bigRow, smallRow) key match appears exactly once because each
  * big row carries exactly one salt and each small row appears exactly
  * once per salt value.
  */
object SkewJoin {

  private val SaltCol = "__graft_salt"

  def salted(big: DataFrame, small: DataFrame, key: String,
      saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    val bigS = big.withColumn(SaltCol,
      pmod(xxhash64(struct(big.columns.toIndexedSeq.map(col): _*)), lit(saltBuckets))
        .cast("int"))
    val smallS = small.withColumn(SaltCol,
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    bigS.join(smallS, Seq(key, SaltCol)).drop(SaltCol)
  }
}
