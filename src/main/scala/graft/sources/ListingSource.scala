package graft.sources

import java.io.File
import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, StringContains, StringEndsWith, StringStartsWith}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The reference Search client's directory scan (SearchMRC.cpp:46-75)
  * as a DataSource V2 connector — the modern Spark shape for a custom
  * source, with the two capabilities that matter at scale implemented
  * for real:
  *
  *  - **filter pushdown** (`SupportsPushDownFilters`): equality /
  *    contains / prefix / suffix predicates on `dir`/`name` are
  *    evaluated inside the scan while listing — the Search query's
  *    substring filter never materializes non-matching rows (the
  *    reference evaluated it post-shuffle in Reduce, SearchMRC.cpp:87);
  *  - **column pruning** (`SupportsPushDownRequiredColumns`): a
  *    `select(name)` reads no dir column;
  *  - **aggregate pushdown** (`SupportsPushDownAggregates`):
  *    COUNT/MIN/MAX absorb into the walk, one partial row per
  *    directory;
  *  - **limit pushdown** (`SupportsPushDownLimit`): `limit k` bounds
  *    each directory partition's walk at k matching entries;
  *  - **one input partition per directory**: listing parallelism scales
  *    with the path list, and each task touches only its own dirs.
  *
  * Usage: `spark.read.format("graft.sources.ListingSource")
  *   .option("paths", "/a,/b").load()` → rows of (dir, name).
  * Reference semantics preserved: non-directories silently dropped,
  * dot entries skipped, duplicates across dirs kept.
  */
class ListingSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ListingSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new ListingTable(Option(properties.get("paths")).getOrElse(""))
}

object ListingSource {
  val Schema: StructType = StructType(Seq(
    StructField("dir", StringType, nullable = false),
    StructField("name", StringType, nullable = false)))

  /** Compile the pushable subset of Spark filters to a row predicate. */
  private[sources] def compile(f: Filter): Option[(String, String) => Boolean] = {
    def colVal(col: String)(dir: String, name: String): Option[String] =
      col match {
        case "dir" => Some(dir)
        case "name" => Some(name)
        case _ => None
      }
    f match {
      case EqualTo(c, v: String) =>
        Some((d, n) => colVal(c)(d, n).contains(v))
      case StringContains(c, v) =>
        Some((d, n) => colVal(c)(d, n).exists(_.contains(v)))
      case StringStartsWith(c, v) =>
        Some((d, n) => colVal(c)(d, n).exists(_.startsWith(v)))
      case StringEndsWith(c, v) =>
        Some((d, n) => colVal(c)(d, n).exists(_.endsWith(v)))
      case _ => None
    }
  }
}

private class ListingTable(paths: String) extends Table with SupportsRead {
  override def name(): String = s"listing($paths)"
  override def schema(): StructType = ListingSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val p = Option(options.get("paths")).filter(_.nonEmpty).getOrElse(paths)
    new ListingScanBuilder(p.split(",").map(_.trim).filter(_.nonEmpty))
  }
}

private class ListingScanBuilder(paths: Array[String])
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates
    with SupportsPushDownLimit {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = ListingSource.Schema
  // pushed aggregate functions as a serializable spec: (op, column),
  // op ∈ count_star / count / min / max — the AggregateFunc objects
  // themselves never cross the driver boundary
  private var aggSpec: Array[(String, String)] = Array.empty
  private var limit: Int = -1

  /** LIMIT stops the listing walk itself: each directory partition
    * emits at most `limit` entries and stops calling list-iteration
    * past that point — a `limit 10` over a 10⁹-file listing reads 10
    * names per directory, not the directory. PARTIAL pushdown
    * (isPartiallyPushed stays true): every partition honors the bound
    * locally and Spark's own GlobalLimit still merges across
    * partitions — correct at any partition count. */
  override def pushLimit(l: Int): Boolean = { limit = l; true }
  // explicit, though it is the interface default: each partition only
  // bounds its OWN walk, so Spark must keep its GlobalLimit — claiming
  // complete pushdown with >1 directory would return up to paths×k rows
  override def isPartiallyPushed(): Boolean = true

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, rest) =
      filters.partition(f => ListingSource.compile(f).isDefined)
    pushed = supported
    rest // Spark keeps a Filter node only for these
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** COUNT/MIN/MAX absorb into the listing walk itself — the directory
    * census never materializes one row per entry (the engine-native
    * depth step past filter pushdown + column pruning: a `count(*)`
    * over a 10⁹-file listing returns one partial row PER DIRECTORY).
    * Partial pushdown contract (`supportCompletePushDown` stays
    * false): each input partition emits its own partial count /
    * min / max and Spark's final merge sums / folds them — correct at
    * any partition count, no global state in the source. */
  override def pushAggregation(aggregation: Aggregation): Boolean = {
    if (aggregation.groupByExpressions.nonEmpty) return false
    // NON-NULL INVARIANT: count(col) below reuses the same partial row
    // count as count(*), which is correct ONLY because every column in
    // this accept-list is non-nullable by construction (a filesystem
    // entry always has a dir and a name). Any column added here must
    // either keep that invariant or make the reader count only its
    // non-null values — otherwise the pushed count(col) over-counts.
    def colOf(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = e match {
      case nr: NamedReference if nr.fieldNames.length == 1 &&
          (nr.fieldNames()(0) == "dir" || nr.fieldNames()(0) == "name") =>
        Some(nr.fieldNames()(0))
      case _ => None
    }
    val specs = aggregation.aggregateExpressions.map {
      case _: CountStar => Some(("count_star", ""))
      case c: Count if !c.isDistinct =>
        colOf(c.column).map(("count", _))
      case m: Min => colOf(m.column).map(("min", _))
      case m: Max => colOf(m.column).map(("max", _))
      case _ => None
    }
    if (specs.exists(_.isEmpty)) return false
    aggSpec = specs.map(_.get)
    true
  }

  override def build(): Scan =
    if (aggSpec.nonEmpty) new ListingAggScan(paths, pushed, aggSpec)
    else new ListingScan(paths, pushed, required, limit)
}

private case class ListingPartition(dir: String) extends InputPartition

private class ListingScan(paths: Array[String], filters: Array[Filter],
    required: StructType, limit: Int) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"ListingScan(paths=${paths.length}, pushed=${filters.mkString(",")}" +
      (if (limit >= 0) s", PushedLimit=$limit" else "") + ")"

  override def planInputPartitions(): Array[InputPartition] =
    paths.map(ListingPartition(_): InputPartition)

  override def createReaderFactory(): PartitionReaderFactory =
    new ListingReaderFactory(filters, required.fieldNames, limit)
}

/** Aggregate-pushdown scan: one PARTIAL row per directory partition,
  * schema = one field per pushed function (count → long, min/max →
  * string, matching V2ScanRelationPushDown's partial-agg contract). */
private class ListingAggScan(paths: Array[String], filters: Array[Filter],
    aggSpec: Array[(String, String)]) extends Scan with Batch {
  override def readSchema(): StructType = StructType(aggSpec.zipWithIndex.map {
    case ((op, c), i) => op match {
      case "count_star" | "count" => StructField(s"agg$i", LongType, nullable = false)
      case _ => StructField(s"agg$i", StringType, nullable = true)
    }
  })
  override def toBatch: Batch = this
  override def description(): String =
    s"ListingAggScan(paths=${paths.length}, pushed=${filters.mkString(",")}, " +
      s"PushedAggregates=[${aggSpec.map { case (o, c) => s"$o($c)" }.mkString(",")}])"

  override def planInputPartitions(): Array[InputPartition] =
    paths.map(ListingPartition(_): InputPartition)

  override def createReaderFactory(): PartitionReaderFactory =
    new ListingAggReaderFactory(filters, aggSpec)
}

private class ListingAggReaderFactory(filters: Array[Filter],
    aggSpec: Array[(String, String)]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val dir = p.asInstanceOf[ListingPartition].dir
    val preds = filters.flatMap(ListingSource.compile)
    new PartitionReader[InternalRow] {
      private var done = false
      override def next(): Boolean = !done
      override def get(): InternalRow = {
        done = true
        // ONE pass over the filtered listing computes every partial
        var n = 0L
        var minD: String = null; var maxD: String = null
        var minN: String = null; var maxN: String = null
        val it = Option(new File(dir).list()).getOrElse(Array.empty[String])
          .iterator.filter(nm => preds.forall(_(dir, nm)))
        while (it.hasNext) {
          val nm = it.next()
          n += 1
          if (minN == null || nm < minN) minN = nm
          if (maxN == null || nm > maxN) maxN = nm
          if (minD == null || dir < minD) minD = dir
          if (maxD == null || dir > maxD) maxD = dir
        }
        def s(v: String) = if (v == null) null else UTF8String.fromString(v)
        InternalRow.fromSeq(aggSpec.toSeq.map {
          case ("count_star", _) | ("count", _) => n
          case ("min", "dir") => s(minD)
          case ("max", "dir") => s(maxD)
          case ("min", "name") => s(minN)
          case ("max", "name") => s(maxN)
          case other => sys.error(s"unreachable agg spec $other")
        })
      }
      override def close(): Unit = ()
    }
  }
}

private class ListingReaderFactory(filters: Array[Filter],
    columns: Array[String], limit: Int) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val dir = p.asInstanceOf[ListingPartition].dir
    val preds = filters.flatMap(ListingSource.compile)
    val base = Option(new File(dir).list()).getOrElse(Array.empty[String])
      .iterator.filter(n => preds.forall(_(dir, n)))
    // partial limit: stop the walk after `limit` matching entries —
    // the filter runs BEFORE the take, so a pushed predicate + limit
    // returns the first `limit` MATCHES, not matches within the
    // first `limit` entries
    val entries = if (limit >= 0) base.take(limit) else base
    new PartitionReader[InternalRow] {
      private var cur: String = _
      override def next(): Boolean =
        if (entries.hasNext) { cur = entries.next(); true } else false
      override def get(): InternalRow =
        InternalRow.fromSeq(columns.toSeq.map {
          case "dir" => UTF8String.fromString(dir)
          case "name" => UTF8String.fromString(cur)
        })
      override def close(): Unit = ()
    }
  }
}
