package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The DotProductRewrite optimizer rule: the portable lambda-chain dot
  * product must be rewritten to the fused DotLong expression — and only
  * on the exact long-typed shape. */
class RewriteSpec extends SparkSuite {
  import spark.implicits._

  private lazy val df = {
    GraftFunctions.register(spark)
    Seq((Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)), (Seq(10L, 0L), Seq(1L, 7L)))
      .toDF("qa", "qb")
  }

  private val lambdaForm =
    "aggregate(zip_with(qa, qb, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"

  test("lambda-chain dot product is rewritten to dot_long") {
    GraftFunctions.register(spark)
    // local relations constant-fold the whole projection away, so
    // check the plan over a parquet-backed frame
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(expr("transform(embedding, x -> cast(x as bigint))").as("qa"))
      .select(col("qa"), col("qa").as("qb"))
    val q = emb.select(expr(lambdaForm).as("dot"))
    assert(q.queryExecution.optimizedPlan.toString.contains("dot_long"),
      q.queryExecution.optimizedPlan.toString)
    // and values over the in-memory frame still fold to the same result
    assert(df.select(expr(lambdaForm)).as[Long].collect().toSeq === Seq(32L, 10L))
  }

  test("rewrite matches the explicit dot_long results") {
    val a = df.select(expr(lambdaForm)).as[Long].collect().toSeq
    val b = df.select(expr("dot_long(qa, qb)")).as[Long].collect().toSeq
    assert(a === b)
  }

  test("dot_long and the lambda form agree on unequal lengths (both null)") {
    val uneven = Seq((Seq(1L, 2L, 3L), Seq(4L, 5L))).toDF("qa", "qb")
    val viaLambda = uneven.select(expr(lambdaForm)).collect().head
    val viaNative = uneven.select(expr("dot_long(qa, qb)")).collect().head
    assert(viaLambda.isNullAt(0) && viaNative.isNullAt(0))
  }

  test("non-matching shapes are left alone") {
    // different zero, different merge op, non-long arrays: all untouched
    val other = df.select(
      expr("aggregate(zip_with(qa, qb, (x, y) -> x * y), 1L, (acc, v) -> acc + v)").as("z1"),
      expr("aggregate(zip_with(qa, qb, (x, y) -> x + y), 0L, (acc, v) -> acc + v)").as("z2"))
    val plan = other.queryExecution.optimizedPlan.toString
    assert(!plan.contains("dot_long"), plan)
    assert(other.as[(Long, Long)].collect().toSeq === Seq((33L, 21L), (11L, 18L)))
  }
}
