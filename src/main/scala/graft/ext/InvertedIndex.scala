package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inverted-index construction: term → ordered posting list of
  * (doc_id, tf) — the retrieval-side artifact behind [[Bm25]] (which
  * scores against a query on the fly; this materializes the index a
  * serving system loads). One explode + one (doc, term) count + one
  * term-keyed aggregation, all map-side combinable.
  *
  * Skew is the classic inverted-index problem: a stopword's posting
  * list is corpus-sized. `maxDf` drops terms whose document frequency
  * exceeds it — the standard stop-list cut (a term in half the corpus
  * carries no retrieval signal and its list would concentrate one
  * reducer); the cut happens BEFORE posting-list assembly, so the hot
  * lists are never built. `minDf` prunes the hapax tail that bloats the
  * term dictionary.
  *
  * The posting list itself is emitted as a digest (doc count, tf sum,
  * md5 of the ordered doc list) rather than a nested array column: the
  * digest pins every entry and its order for the oracle while keeping
  * the output schema engine-portable; a serving sink would write the
  * array form from the same aggregation. */
object InvertedIndex {

  def postings(docs: DataFrame, minDf: Long = 2L, maxDf: Long = 10000L,
               idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(minDf <= maxDf, s"minDf $minDf > maxDf $maxDf")
    val tf = docs
      .select(col(idCol).cast("long").as("doc_id"),
        explode(split(col(textCol), " ")).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
    tf.groupBy("term")
      .agg(count(lit(1)).as("df"), sum("tf").as("tf_total"),
        md5(concat_ws(",",
          sort_array(collect_list(concat_ws(":", col("doc_id"), col("tf")))))
          .cast("binary")).as("postings_md5"))
      .where(col("df") >= minDf && col("df") <= maxDf)
  }

  /** DuckDB rendering of [[postings]] over `tableSql`. */
  def postingsOracleSql(tableSql: String, minDf: Long = 2L,
                        maxDf: Long = 10000L): String =
    s"""WITH tok AS (SELECT "doc_id", unnest(string_split("text", ' ')) AS term
       |   FROM $tableSql),
       | tf AS (SELECT term, "doc_id", count(*) AS tf FROM tok GROUP BY 1, 2),
       | px AS (SELECT term, concat(CAST("doc_id" AS VARCHAR), ':',
       |     CAST(tf AS VARCHAR)) AS entry, "doc_id", tf FROM tf),
       | agg AS (SELECT term, count(*) AS df, sum(tf) AS tf_total,
       |     md5(list_aggregate(list_sort(list(entry)), 'string_agg', ','))
       |       AS postings_md5
       |   FROM px GROUP BY 1)
       | SELECT term, df, CAST(tf_total AS BIGINT) AS tf_total, postings_md5
       | FROM agg WHERE df BETWEEN $minDf AND $maxDf""".stripMargin
      .replace("\n", " ")
}
