package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object ops {
  /** A registered query: (session, sfDir) → result DataFrame.
    * Contract (SURVEY.md §7.3): result must be deterministic — every
    * query ends in a total ORDER BY, doubles routed through [[graft.Num]]. */
  type Q = (SparkSession, String) => DataFrame
}
