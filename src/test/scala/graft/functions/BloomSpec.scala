package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSuite {
  import spark.implicits._

  private val M = 1024
  private val K = 3

  private def bitset(keys: Seq[Long], parts: Int): Seq[Long] = {
    GraftFunctions.register(spark)
    keys.toDF("k").repartition(parts)
      .agg(expr(s"bloom_agg(k, $M, $K)").as("bl"))
      .as[Seq[Long]].collect().head
  }

  test("aggregate bits agree with the SQL xxhash64 probe — no false negatives") {
    val keys = (1L to 200L).map(_ * 7919)
    val bl = bitset(keys, 5)
    // probe with the EXACT SQL expression the query-side filter uses:
    // every inserted key must test positive
    val probe = keys.toDF("k")
      .withColumn("bl", typedLit(bl))
      .filter(expr(Bloom.containsSql("bl", "k", M, K)))
      .count()
    assert(probe === keys.size.toLong,
      "a key inserted by the aggregate must pass the SQL membership test")
  }

  test("bitset is partition-order independent (OR-merge is commutative)") {
    val gen = new scala.util.Random(3)
    val keys = Seq.fill(300)(gen.nextLong())
    assert(bitset(keys, 1) === bitset(gen.shuffle(keys), 8))
  }

  test("filter prunes non-members at plausible rates") {
    val members = (1L to 100L).toSeq
    val bl = bitset(members, 2)
    val nonMembers = (100001L to 101000L).toSeq
    val fp = nonMembers.toDF("k")
      .withColumn("bl", typedLit(bl))
      .filter(expr(Bloom.containsSql("bl", "k", M, K)))
      .count()
    // 100 keys × 3 hashes in 1024 bits → ~25% bits set → fp ≈ 0.25³ ≈ 1.6%
    assert(fp < 100, s"false-positive rate implausibly high: $fp/1000")
  }

  test("nulls are ignored") {
    GraftFunctions.register(spark)
    val bl = Seq(Some(5L), None).toDF("k")
      .agg(expr(s"bloom_agg(k, 128, 2)").as("bl"))
      .as[Seq[Long]].collect().head
    assert(bl.map(java.lang.Long.bitCount).sum <= 2)
  }
}
