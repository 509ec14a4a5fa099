package graft.core

import graft.SparkSuite
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Framework-contract property test (SURVEY.md §5.3): for arbitrary
  * inputs, map/reduce emission counts, and dop, the distributed runner
  * must equal the 6-line sequential model as a key-sorted multiset —
  * exactly the reference's output contract (key-sorted, tie order
  * unspecified; MRFCore.cpp:417-420).
  */
object MapReduceContractProps extends Properties("MapReduce.run") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSuite.session
  import spark.implicits._

  /** Variable-fan-out job: map tokenizes the key and emits one pair
    * per token (0..n emissions — the Search generator pattern); reduce
    * sums and re-emits, doubling even sums (0..2 emissions). */
  private object TestJob
      extends MapReduce[String, Int, String, Int, String, Int] {
    def map(k1: String, v1: Int): Iterator[(String, Int)] =
      k1.split(" ").iterator.filter(_.nonEmpty).map(t => (t, v1))
    def reduce(k2: String, v2s: Iterator[Int]): Iterator[(String, Int)] = {
      val s = v2s.sum
      if (s % 2 == 0) Iterator((k2, s), (k2 + "!", s)) else Iterator((k2, s))
    }
  }

  private val keyGen =
    Gen.listOfN(3, Gen.oneOf("a", "b", "cc", "d e", "", "f g h"))
      .map(_.mkString(" "))
  private val inputGen = Gen.listOf(Gen.zip(keyGen, Gen.choose(-5, 5)))
  private val dopGen = Gen.choose(1, 4)

  property("equals sequential model for any input and dop") =
    forAll(inputGen, dopGen) { (input: List[(String, Int)], dop: Int) =>
      val dist = MapReduce
        .run(spark.createDataset(input), TestJob, Some(dop))
        .collect().toSeq
      val seq = MapReduce.sequential(input, TestJob)
      // compare as multisets via total sort (the engine only fixes key order)
      dist.sorted == seq.sorted
    }
}
