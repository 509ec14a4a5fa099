package graft.ops

import graft.Tables
import graft.clients.Search
import org.apache.spark.sql.functions._

/** Text/token operators over `documents` — the reference model's home
  * turf (Map-emitting-tokens is its canonical generator, SURVEY.md §2c
  * "UDTF / generator"), plus the Search client query itself.
  *
  * Scale notes: tokenization is `explode(split(...))` — a generator
  * inside whole-stage codegen, no shuffle until the aggregate; the
  * inverted index is one groupBy(token) exchange carrying (token,
  * doc_id) pairs, the minimum possible.
  */
object TextOps {

  val queries: Map[String, Q] = Map(
    // The reference's Search, idiomatic form: pushed Contains filter +
    // projection + sort (SearchMRC.cpp:78-98 semantics — case-sensitive,
    // duplicates preserved).
    "q_search" -> ((s, dir) =>
      Search.dataframe(Tables(s, dir, "part"), "p_brand", "p_name", "wid")),

    // Wordcount — the canonical MapReduce derivation.
    "q_wordcount" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy(col("word"))
        .agg(count(lit(1)).as("n"))
        .orderBy("word")
    }),

    // Inverted index: token → sorted distinct posting list (serialized
    // to a string so the oracle compare is schema-stable).
    "q_inverted_index" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .distinct()
        .groupBy(col("word"))
        .agg(count(lit(1)).as("df"),
          concat_ws(",", sort_array(collect_set(col("doc_id"))))
            .as("postings"))
        .orderBy("word")
    }))

  val oracles: Map[String, String] = Map(
    "q_search" -> """
      SELECT p_name FROM part WHERE p_name LIKE '%wid%' ORDER BY p_name""",
    "q_wordcount" -> """
      SELECT word, count(*) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      WHERE word <> '' GROUP BY word ORDER BY word""",
    "q_inverted_index" -> """
      SELECT word, count(*) AS df,
        string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
      FROM (SELECT DISTINCT doc_id, word FROM
             (SELECT doc_id, unnest(string_split(text, ' ')) AS word
              FROM documents))
      WHERE word <> '' GROUP BY word ORDER BY word""")
}
