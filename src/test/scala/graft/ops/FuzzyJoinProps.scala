package graft.ops

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property form of FuzzyJoinSpec's equality: over RANDOM small-
  * alphabet corpora — lengths 0 through ~8, so the short-name union
  * arm, the segment path and the boundary between them are all
  * exercised with adversarial density (a 3-letter alphabet packs many
  * pairs inside edit distance 2) — the PassJoin segment plan must emit
  * EXACTLY the plain blocked join's pair set. A lost pair here means
  * the pigeonhole enumeration (segment lengths, ±τ windows, clipping)
  * is wrong somewhere the fixed cases missed. */
object FuzzyJoinProps extends Properties("Joins.fuzzyPairsSegmented") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(6)

  private lazy val spark = graft.SparkSuite.session
  import spark.implicits._

  private val nameGen: Gen[String] = for {
    len <- Gen.frequency(2 -> Gen.choose(0, 2), 8 -> Gen.choose(3, 8))
    cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
  } yield cs.mkString

  private val corpusGen: Gen[List[(String, String)]] =
    Gen.listOfN(40, Gen.zip(Gen.oneOf("b1", "b2"), nameGen))

  property("emits exactly the plain blocked join's pair set") =
    forAll(corpusGen) { rows =>
      val df = rows.zipWithIndex
        .map { case ((b, n), i) => (b, i.toLong, n) }
        .toDF("p_brand", "p_partkey", "p_name")
      val plain = Joins.fuzzyPairs(df)
        .as[(String, Long, Long, String, String, Int)].collect().toSet
      val seg = Joins.fuzzyPairsSegmented(df)
        .as[(String, Long, Long, String, String, Int)].collect().toSet
      seg == plain
    }
}
