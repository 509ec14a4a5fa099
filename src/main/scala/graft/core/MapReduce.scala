package graft.core

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}

/** The reference framework's client contract, re-expressed purely.
  *
  * Mirrors `MapReduceBase` (reference MapReduceClient.h:47-51): a user
  * supplies a Map over each input pair and a Reduce over each
  * intermediate-key group. The reference's side-effecting `Emit2`/`Emit3`
  * callbacks (MapReduceFramework.cpp:17-44) become *returned* iterators —
  * semantically identical (0..n emissions per call) but pure and
  * serializable, which is what Spark's `flatMap`/`flatMapGroups` need.
  *
  * Key-semantics contract carried over from the reference: the reference
  * groups by comparator equivalence `!(a<b) && !(b<a)` (MRFCore.h:19-23,
  * MRFCore.cpp:162-164) while Spark groups by `equals`/`hashCode`. Users
  * must supply a `K2` whose equality is consistent with its ordering —
  * true for every standard Scala/Catalyst type — making the two coincide.
  */
trait MapReduce[K1, V1, K2, V2, K3, V3] extends Serializable {
  /** Stage 1: invoked once per input pair; emits 0..n intermediate pairs
    * (reference `Map` + `Emit2`). */
  def map(k1: K1, v1: V1): Iterator[(K2, V2)]

  /** Stage 2: invoked once per distinct intermediate key with all its
    * values; emits 0..n output pairs (reference `Reduce` + `Emit3`).
    * Values arrive as a streaming iterator — only materialize if the
    * logic truly needs the whole group (the reference always
    * materializes `V2_VEC`, which caps group size at memory; we don't).
    */
  def reduce(k2: K2, v2s: Iterator[V2]): Iterator[(K3, V3)]
}

/** Distributed runner for [[MapReduce]] jobs — the Spark-native
  * equivalent of `RunMapReduceFramework` (reference
  * MapReduceFramework.h:13-14, MRFCore.cpp:252-446).
  *
  * The reference's whole engine (N map threads → 1 shuffle thread → N
  * reduce threads → global `std::sort`, with three pthread barriers)
  * collapses to one declarative Dataset chain; Spark stages are the
  * barriers, the exchange is the shuffle thread, and the range-partitioned
  * sort replaces the final single-threaded `std::sort`
  * (MRFCore.cpp:417-420). At cluster scale each phase is distributed —
  * including the sort, which the reference serializes on one thread.
  */
object MapReduce {
  /** Run map → groupByKey → reduce → global key sort.
    *
    * @param dop optional degree of parallelism for the map stage — the
    *   reference's `multiThreadLevel` knob. Default: leave partitioning
    *   to the source + AQE (preferred at scale; a forced `repartition`
    *   is an extra shuffle).
    * @return output sorted by K3 — a key-sorted multiset; tie order
    *   among equal keys is unspecified, exactly the reference's
    *   contract (unstable `std::sort` on keys only).
    */
  def run[K1, V1, K2, V2, K3, V3](
      input: Dataset[(K1, V1)],
      mr: MapReduce[K1, V1, K2, V2, K3, V3],
      dop: Option[Int] = None)(implicit
      e2: Encoder[(K2, V2)],
      ek2: Encoder[K2],
      e3: Encoder[(K3, V3)]): Dataset[(K3, V3)] = {
    val in = dop.fold(input)(n => input.repartition(n))
    in.flatMap { case (k1, v1) => mr.map(k1, v1) }
      .groupByKey(_._1)
      .flatMapGroups { (k2, it) => mr.reduce(k2, it.map(_._2)) }
      .orderBy("_1")
  }

  /** Sequential reference model of [[run]] — used by property tests to
    * pin the framework contract: for any input, any map/reduce, and any
    * dop, the distributed result must equal this as a key-sorted
    * multiset. */
  def sequential[K1, V1, K2, V2, K3, V3](
      input: Seq[(K1, V1)],
      mr: MapReduce[K1, V1, K2, V2, K3, V3])(implicit
      ord: Ordering[K3]): Seq[(K3, V3)] =
    input
      .flatMap { case (k1, v1) => mr.map(k1, v1) }
      .groupBy(_._1)
      .toSeq
      .flatMap { case (k2, kvs) => mr.reduce(k2, kvs.iterator.map(_._2)) }
      .sortBy(_._1)
}
