package graft.sources

import java.io.File

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Filesystem-metadata scan — the reference Search client's Map stage
  * (`opendir`/`readdir` per input directory, reference
  * SearchMRC.cpp:46-75) as a distributed source.
  *
  * Semantics pinned from the reference:
  *  - one input row per directory path; arguments that are not readable
  *    directories are silently dropped (SearchMRC.cpp:55-57 returns on
  *    `opendir` failure);
  *  - every directory entry name is emitted — files and subdirectories
  *    alike, non-recursive; `.`/`..` are skipped (SearchMRC.cpp:60-63);
  *  - output is (dir, name) pairs, duplicates across dirs preserved.
  *
  * Scale shape: the path list is a Dataset partitioned across the
  * cluster and each task lists its own directories (a 1→N generator in
  * the scan, the same shape as Spark's own distributed file listing);
  * no metadata ever passes through the driver. */
object DirListing {

  def apply(spark: SparkSession, dirs: Seq[String]): DataFrame = {
    import spark.implicits._
    listed(spark.createDataset(dirs)).toDF("dir", "name")
  }

  /** Typed form over an existing Dataset of directory paths. */
  def listed(dirs: Dataset[String]): Dataset[(String, String)] = {
    import dirs.sparkSession.implicits._
    dirs.flatMap { d =>
      val entries = new File(d).list() // null when not a listable dir
      if (entries == null) Iterator.empty
      else entries.iterator.map(name => (d, name))
    }
  }
}
