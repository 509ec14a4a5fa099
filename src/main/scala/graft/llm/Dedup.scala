package graft.llm

import graft.Tables
import graft.ops.Q
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` — the north-star
  * training-data-pipeline extensions (BASELINE.json; SURVEY.md §2c last
  * row). The reference has no dedup, but each of these is a canonical
  * MapReduce composition (map = feature extraction, shuffle = group by
  * feature, reduce = bucket inspection) over its API
  * (MapReduceClient.h:47-51).
  *
  * Cross-engine exactness (the DuckDB oracle hash-compares values):
  *  - all hashes are `md5` hex strings — identical lowercase hex in
  *    Spark and DuckDB, with identical lexicographic `min`;
  *  - Jaccard/cosine arrive at doubles only through a single division
  *    of exact integers, which is IEEE-deterministic in both engines.
  *
  * Scale notes (100 TB):
  *  - exact dedup is one hash-aggregate — one shuffle on the 32-char
  *    digest, partial agg map-side; skew-free (hashes are uniform);
  *  - MinHash+LSH is the scale path for near-dup: candidates come from
  *    an equality self-join on (band, band-signature) — shuffle on the
  *    band key, never an O(n²) cross join; only candidates pay the
  *    verify join;
  *  - the brute-force shingle self-join (q_dedup_jaccard) is the
  *    correctness baseline — at scale, hot shingles (stopword n-grams)
  *    must be frequency-capped first; LSH is the production path;
  *  - embedding near-dup blocks by `label` (an IVF-style coarse
  *    quantizer cell) so each block's pair count is bounded.
  */
object Dedup {

  /** Distinct 3-token shingles per document. Generator (explode) inside
    * whole-stage codegen; no shuffle until the consumer aggregates.
    * Docs with <3 tokens yield no shingles (matches the oracle's empty
    * generate_series). */
  private def shingles(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(t) - 3), " +
          "i -> concat_ws(' ', t[i], t[i+1], t[i+2]))")).as("shingle"))
      .distinct()

  /** Oracle twin of [[shingles]] (DuckDB arrays are 1-based). */
  private val SH =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
      |       FROM toks, UNNEST(generate_series(1, greatest(len(t) - 2, 0))) AS u(i))""".stripMargin

  /** Embeddings quantized to int64 fixed-point (×10⁴) so dot products
    * and norms are exact integer arithmetic — bit-identical across
    * engines and partial-aggregation orders. float→double is exact;
    * both engines round half away from zero. */
  private[llm] def quantized(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings").select(
      col("vec_id"), col("label"),
      expr("transform(embedding, x -> cast(round(cast(x as double) * 10000) as bigint))").as("q"))
      .withColumn("norm", expr("aggregate(transform(q, x -> x * x), 0L, (acc, v) -> acc + v)"))

  private[llm] val QE =
    """qe AS (SELECT vec_id, label,
      |         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS q
      |       FROM embeddings),
      |qn AS (SELECT vec_id, label, q,
      |         CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS norm
      |       FROM qe)""".stripMargin

  /** Exact integer dot product of two quantized vectors. */
  private[llm] val dotExpr =
    "aggregate(zip_with(qa, qb, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"
  private[llm] val dotOracle =
    "CAST(list_sum(list_transform(generate_series(1, len(qa)), i -> qa[i] * qb[i])) AS BIGINT)"

  /** cosine = (dot / √na) / √nb — same operation order both engines. */
  private[llm] def cosine(): org.apache.spark.sql.Column =
    round(col("dot").cast("double") / sqrt(col("na").cast("double"))
      / sqrt(col("nb").cast("double")), 4)

  val queries: Map[String, Q] = Map(
    // Exact dedup: group by content digest, elect min-id keeper.
    // One hash-aggregate; at 100 TB the digest is computed in the scan
    // projection and the exchange carries (digest, id) only.
    "q_dedup_exact" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .groupBy(md5(col("text")).as("content_hash"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
        .orderBy("content_hash")
    }),

    // Bag-of-words dedup: same, on an order-insensitive canonical form
    // (sorted token multiset) — catches shuffled near-copies exactly.
    "q_dedup_bag" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .groupBy(md5(concat_ws(" ", sort_array(split(col("text"), " "))))
          .as("bag_hash"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
        .orderBy("bag_hash")
    }),

    // Brute-force n-gram Jaccard near-dup: distinct-shingle self-join →
    // pair intersection counts → |A∩B| / |A∪B| ≥ 0.8. The verify
    // baseline for LSH; the join shuffles on the shingle string.
    "q_dedup_jaccard" -> ((s, dir) => {
      val sh = shingles(s, dir)
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = sh.as("x")
        .join(sh.as("y"), col("x.shingle") === col("y.shingle") &&
          col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
        .agg(count(lit(1)).as("inter"))
      inter
        .join(sizes.select(col("doc_id").as("d1"), col("n").as("n1")), "d1")
        .join(sizes.select(col("doc_id").as("d2"), col("n").as("n2")), "d2")
        .withColumn("jac", col("inter").cast("double") /
          (col("n1") + col("n2") - col("inter")).cast("double"))
        .filter(col("jac") >= 0.8)
        .select(col("d1"), col("d2"), round(col("jac"), 4).as("jaccard"))
        .orderBy("d1", "d2")
    }),

    // MinHash + LSH banding: 16 signatures (min over md5(i:shingle)),
    // 4 bands × 4 rows; docs sharing any band bucket become candidates;
    // candidates alone are Jaccard-verified at ≥ 0.7. THE scale path:
    // the only shuffles are groupBys on (doc, i)/(doc, band) and an
    // equality join on the band key — no cross join at any SF.
    "q_dedup_minhash" -> ((s, dir) => {
      val sh = shingles(s, dir)
      val sig = sh
        .select(col("doc_id"), col("shingle"), explode(expr("sequence(0, 15)")).as("i"))
        .groupBy(col("doc_id"), col("i"))
        .agg(min(md5(concat(col("i").cast("string"), lit(":"), col("shingle")))).as("mh"))
      val bands = sig
        .groupBy(col("doc_id"), expr("i div 4").as("band"))
        .agg(concat_ws(",", sort_array(collect_list(col("mh")))).as("bkey"))
      val cand = bands.as("a")
        .join(bands.as("b"), col("a.band") === col("b.band") &&
          col("a.bkey") === col("b.bkey") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .distinct()
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = cand
        .join(sh.as("s1"), col("d1") === col("s1.doc_id"))
        .join(sh.as("s2"), col("d2") === col("s2.doc_id") &&
          col("s1.shingle") === col("s2.shingle"))
        .groupBy(col("d1"), col("d2"))
        .agg(count(lit(1)).as("inter"))
      inter
        .join(sizes.select(col("doc_id").as("d1"), col("n").as("n1")), "d1")
        .join(sizes.select(col("doc_id").as("d2"), col("n").as("n2")), "d2")
        .withColumn("jac", col("inter").cast("double") /
          (col("n1") + col("n2") - col("inter")).cast("double"))
        .filter(col("jac") >= 0.7)
        .select(col("d1"), col("d2"), round(col("jac"), 4).as("jaccard"))
        .orderBy("d1", "d2")
    }),

    // SimHash-16 over shingles: per-bit majority vote of feature-hash
    // bits (bit j = high bit of md5 nibble j); identical fingerprints
    // are near-dup candidate pairs. One groupBy(doc) + an equality
    // self-join on the 16-bit fingerprint — the cheapest near-dup
    // screen, with simhash's false +/- semantics by design.
    "q_dedup_simhash" -> ((s, dir) => {
      val sh = shingles(s, dir)
      val votes = sh
        .select(col("doc_id"), md5(col("shingle")).as("h"),
          explode(expr("sequence(1, 16)")).as("j"))
        .groupBy(col("doc_id"), col("j"))
        .agg(sum(when(expr("substr(h, j, 1)")
          .isin("8", "9", "a", "b", "c", "d", "e", "f"), 1).otherwise(-1)).as("vote"))
      val fp = votes.groupBy(col("doc_id"))
        .agg(sum(when(col("vote") >= 0, expr("cast(pow(2, j - 1) as bigint)"))
          .otherwise(lit(0L))).as("simhash"))
      fp.as("a").join(fp.as("b"), col("a.simhash") === col("b.simhash") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
          col("a.simhash").as("simhash"))
        .orderBy("d1", "d2")
    }),

    // Embedding-cosine near-dup, blocked by `label` (IVF-style coarse
    // cell): top-3 most-similar pairs per block. Blocking bounds the
    // pair count to Σ|cell|² instead of n² — the 100 TB pattern.
    "q_dedup_cosine" -> ((s, dir) => {
      val qe = quantized(s, dir)
      val a = qe.select(col("label"), col("vec_id").as("v1"),
        col("q").as("qa"), col("norm").as("na"))
      val b = qe.select(col("label").as("lb"), col("vec_id").as("v2"),
        col("q").as("qb"), col("norm").as("nb"))
      val w = Window.partitionBy(col("label"))
        .orderBy(col("cosine").desc, col("v1").asc, col("v2").asc)
      a.join(b, col("label") === col("lb") && col("v1") < col("v2"))
        .withColumn("dot", expr(dotExpr))
        .withColumn("cosine", cosine())
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("label"), col("v1"), col("v2"), col("cosine"))
        .orderBy(col("label"), col("cosine").desc, col("v1"), col("v2"))
    }))

  val oracles: Map[String, String] = Map(
    "q_dedup_exact" -> """
      SELECT md5(text) AS content_hash, min(doc_id) AS keeper,
             count(*) AS n_copies
      FROM documents GROUP BY 1 ORDER BY content_hash""",
    "q_dedup_bag" -> """
      SELECT md5(array_to_string(list_sort(string_split(text, ' ')), ' ')) AS bag_hash,
             min(doc_id) AS keeper, count(*) AS n_copies
      FROM documents GROUP BY 1 ORDER BY bag_hash""",
    "q_dedup_jaccard" -> (SH + """,
      sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      inter AS (SELECT x.doc_id AS d1, y.doc_id AS d2, count(*) AS inter
                FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
                GROUP BY 1, 2)
      SELECT d1, d2,
             round(CAST(inter AS DOUBLE) / CAST(s1.n + s2.n - inter AS DOUBLE), 4) AS jaccard
      FROM inter JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
      WHERE CAST(inter AS DOUBLE) / CAST(s1.n + s2.n - inter AS DOUBLE) >= 0.8
      ORDER BY d1, d2"""),
    "q_dedup_minhash" -> (SH + """,
      sig AS (SELECT doc_id, i, min(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS mh
              FROM sh, UNNEST(generate_series(0, 15)) AS g(i) GROUP BY 1, 2),
      bands AS (SELECT doc_id, i // 4 AS band, string_agg(mh, ',' ORDER BY mh) AS bkey
                FROM sig GROUP BY 1, 2),
      cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
               FROM bands a JOIN bands b
               ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
      sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      inter AS (SELECT c.d1, c.d2, count(*) AS inter
                FROM cand c JOIN sh s1 ON c.d1 = s1.doc_id
                JOIN sh s2 ON c.d2 = s2.doc_id AND s1.shingle = s2.shingle
                GROUP BY 1, 2)
      SELECT d1, d2,
             round(CAST(inter AS DOUBLE) / CAST(s1.n + s2.n - inter AS DOUBLE), 4) AS jaccard
      FROM inter JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
      WHERE CAST(inter AS DOUBLE) / CAST(s1.n + s2.n - inter AS DOUBLE) >= 0.7
      ORDER BY d1, d2"""),
    "q_dedup_simhash" -> (SH + """,
      votes AS (SELECT doc_id, j,
                  sum(CASE WHEN substr(md5(shingle), j, 1) IN ('8','9','a','b','c','d','e','f')
                      THEN 1 ELSE -1 END) AS vote
                FROM sh, UNNEST(generate_series(1, 16)) AS g(j) GROUP BY 1, 2),
      fp AS (SELECT doc_id,
               CAST(sum(CASE WHEN vote >= 0 THEN CAST(pow(2, j - 1) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
             FROM votes GROUP BY 1)
      SELECT a.doc_id AS d1, b.doc_id AS d2, a.simhash AS simhash
      FROM fp a JOIN fp b ON a.simhash = b.simhash AND a.doc_id < b.doc_id
      ORDER BY d1, d2"""),
    "q_dedup_cosine" -> ("WITH " + QE + s""",
      pairs AS (SELECT a.label, a.vec_id AS v1, b.vec_id AS v2,
                  a.q AS qa, b.q AS qb, a.norm AS na, b.norm AS nb
                FROM qn a JOIN qn b ON a.label = b.label AND a.vec_id < b.vec_id),
      cos AS (SELECT label, v1, v2,
                round(CAST($dotOracle AS DOUBLE) / sqrt(CAST(na AS DOUBLE)) / sqrt(CAST(nb AS DOUBLE)), 4) AS cosine
              FROM pairs),
      rk AS (SELECT *, row_number() OVER (PARTITION BY label ORDER BY cosine DESC, v1 ASC, v2 ASC) AS rn
             FROM cos)
      SELECT label, v1, v2, cosine FROM rk WHERE rn <= 3
      ORDER BY label, cosine DESC, v1, v2"""))
}
