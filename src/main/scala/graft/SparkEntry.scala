package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._
import graft.llm.{Clustering, Dedup, Multimodal, Similarity, TextAnalysis}
import graft.streaming.Streams

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers one query in
  * [[queries]] and (when ANSI-SQL-expressible) a DuckDB twin in
  * [[oracleSql]] with identical output column names, total ordering,
  * and cross-engine-exact numerics (see [[Num]]).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Aggregates.queries("q1_agg")(spark, "/root/testdata/sf0.001")

  private val modules: Seq[(Map[String, Q], Map[String, String])] = Seq(
    (Aggregates.queries, Aggregates.oracles),
    (Analytics.queries, Analytics.oracles),
    (Joins.queries, Joins.oracles),
    (WindowOps.queries, WindowOps.oracles),
    (SetOps.queries, SetOps.oracles),
    (Scalars.queries, Scalars.oracles),
    (TextOps.queries, TextOps.oracles),
    (Dedup.queries, Dedup.oracles),
    (Similarity.queries, Similarity.oracles),
    (Clustering.queries, Clustering.oracles),
    (TextAnalysis.queries, TextAnalysis.oracles),
    (Multimodal.queries, Multimodal.oracles),
    (Streams.queries, Streams.oracles))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.flatMap(_._1).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.iterator.flatMap(_._2).toMap

  /** Plan-inspection view (Explain, PlanSpec). All registered queries
    * are lazy and cache-free, so today this IS [[queries]]; kept as a
    * seam so any future eager query can register a lazy plan twin here.
    * (The two CC queries run their label loop on construction — their
    * "plan" is the checkpointed label scan by design.) */
  def plans: Map[String, (SparkSession, String) => DataFrame] = queries
}
