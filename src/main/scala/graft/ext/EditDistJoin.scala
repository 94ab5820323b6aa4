package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance similarity self-join (PassJoin — Li, Deng, Feng,
  * "PassJoin: a partition-based method for similarity joins", VLDB 2012):
  * all document pairs within Levenshtein distance τ, found WITHOUT an
  * all-pairs comparison.
  *
  * The pigeonhole that makes it work: partition the SHORTER string of a
  * pair into τ+1 contiguous segments. τ edits can touch at most τ of
  * them, so at least one segment survives VERBATIM in the longer string,
  * displaced by at most the net indel offset of the edits before it —
  * which is bounded by τ. Candidates are therefore an EQUI-join:
  *
  *  - the index side emits each document's τ+1 canonical segments,
  *    keyed (len, segment_index, segment_string) — τ+1 rows per doc;
  *  - the probe side emits, for every partner length ℓ ∈ [len−τ, len]
  *    and every segment index, the substrings at the canonical position
  *    ±τ — a per-row constant ≤ (τ+1)²·(2τ+1) rows, independent of
  *    corpus size;
  *  - the join key carries the partner length, so a probe row can only
  *    meet index rows it was generated for.
  *
  * Candidates then verify with the banded Levenshtein
  * (`levenshtein(l, r, threshold)` — O(τ·n) per pair, not O(n²)) and
  * pairs are normalised (doc_a < doc_b) with `distinct` (equal-length
  * pairs can arise from both directions, and several segments can
  * match).
  *
  * Scale shape: two bounded per-row explodes and ONE string-keyed
  * equi-join — the same banded topology as the MinHash/SimHash/set-sim
  * joins; no all-pairs anywhere. The τ² probe fan-out is the documented
  * PassJoin constant (τ is small — this is a near-dup operator, not a
  * fuzzy search). Hot segments (a popular exact substring) concentrate
  * one join key; the candidate set is DISTINCT-ed before verification
  * so each pair verifies once.
  *
  * The reference (MagmaPandas) has no string-similarity surface;
  * beyond-reference pipeline operator alongside the MinHash/SimHash/
  * Jaccard dedup family — edit distance is the right tool when
  * near-dups differ by a few TYPOS (OCR noise, template drift) rather
  * than token-level shingle overlap.
  */
object EditDistJoin {

  /** Canonical PassJoin partition of a length-`len` string into k
    * segments: the first k − (len mod k) segments have ⌊len/k⌋ chars,
    * the rest one more. Returns (start, width) per segment index,
    * 0-based starts. */
  private[graft] def segments(len: Int, k: Int): Seq[(Int, Int)] = {
    val base = len / k
    val rem = len % k
    var start = 0
    (0 until k).map { i =>
      val w = if (i < k - rem) base else base + 1
      val s = start
      start += w
      (s, w)
    }
  }

  /** All (doc_a, doc_b, dist) pairs with doc_a < doc_b and
    * levenshtein(text_a, text_b) ≤ τ. Requires every text to have at
    * least τ+1 characters (segments must be non-empty); shorter rows
    * are filtered out of BOTH sides (a doc shorter than τ+1 chars is
    * within τ of the empty string — not a meaningful near-dup subject). */
  def selfJoin(docs: DataFrame, tau: Int,
               idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(tau >= 1, s"tau must be >= 1, got $tau")
    val k = tau + 1
    val base = docs
      .select(col(idCol).cast("long").as("id"), col(textCol).as("t"),
        length(col(textCol)).as("len"))
      .where(col("len") >= k)

    // index side: the τ+1 canonical segments of every doc. Segment
    // boundaries depend only on len — computed as a CASE over the
    // segment index from len's integer arithmetic, all inside one
    // bounded explode.
    val segIdx = explode(sequence(lit(0), lit(k - 1))).as("i")
    def segStart(lenC: Column, i: Column): Column = {
      val b = (lenC / k).cast("int")
      val rem = lenC % k
      // first (k - rem) segments are width b: start = i*b for i < k-rem,
      // else (k-rem)*b + (i-(k-rem))*(b+1)
      when(i < lit(k) - rem, i * b)
        .otherwise((lit(k) - rem) * b + (i - (lit(k) - rem)) * (b + 1))
    }
    def segWidth(lenC: Column, i: Column): Column = {
      val b = (lenC / k).cast("int")
      val rem = lenC % k
      when(i < lit(k) - rem, b).otherwise(b + 1)
    }
    val index = base
      .select(col("id").as("id_b"), col("t").as("t_b"),
        col("len").as("len_b"), segIdx)
      .select(col("id_b"), col("t_b"), col("len_b"), col("i"),
        // substring is 1-based
        substring_index_free(col("t_b"),
          segStart(col("len_b"), col("i")) + 1,
          segWidth(col("len_b"), col("i"))).as("seg"))

    // probe side: for every partner length ℓ in [len-τ, len] (partner
    // is the shorter side; ℓ ≥ k so its segments are non-empty) and
    // every segment index, the substrings at the canonical start ± τ,
    // clamped to the probe string's bounds.
    val probe = base
      .select(col("id").as("id_a"), col("t").as("t_a"),
        col("len").as("len_a"),
        explode(sequence(greatest(col("len") - tau, lit(k)), col("len")))
          .as("l"))
      .select(col("id_a"), col("t_a"), col("len_a"), col("l"), segIdx)
      .select(col("id_a"), col("t_a"), col("len_a"), col("l"), col("i"),
        segStart(col("l"), col("i")).as("p"),
        segWidth(col("l"), col("i")).as("w"))
      .select(col("id_a"), col("t_a"), col("len_a"), col("l"), col("i"),
        col("w"),
        explode(sequence(
          greatest(col("p") - tau, lit(0)),
          least(col("p") + tau, col("len_a") - col("w")))).as("s"))
      .select(col("id_a"), col("t_a"), col("len_a"), col("l"), col("i"),
        substring_index_free(col("t_a"), col("s") + 1, col("w")).as("seg"))

    val cand = probe.join(index,
        probe("l") === index("len_b") && probe("i") === index("i") &&
          probe("seg") === index("seg") && probe("id_a") =!= index("id_b"))
      .select(
        least(col("id_a"), col("id_b")).as("doc_a"),
        greatest(col("id_a"), col("id_b")).as("doc_b"),
        col("t_a"), col("t_b"))
      .distinct()
    cand
      .withColumn("dist", levenshtein(col("t_a"), col("t_b"), tau)
        .cast("long"))
      .where(col("dist") >= 0 && col("dist") <= tau)
      .select(col("doc_a"), col("doc_b"), col("dist"))
  }

  /** `substring(str, pos, len)` with COLUMN pos/len (the builtin only
    * takes literals in some Spark versions; expr keeps it engine-exact). */
  private def substring_index_free(str: Column, pos1: Column,
                                   len: Column): Column =
    str.substr(pos1, len)

  /** DuckDB rendering of [[selfJoin]], stage for stage: the same
    * canonical segment arithmetic (integer // and %), the probe windows
    * as bounded offset cross-joins (DuckDB 1.0 does not take lateral
    * column args in generate_series — `len - off`/`p + off` with a
    * WHERE clamp emits the identical index sets), the same
    * distinct-then-verify with DuckDB's levenshtein (identical classic
    * DP — unit costs, no transposition). */
  def selfJoinOracleSql(table: String, tau: Int): String = {
    val k = tau + 1
    s"""WITH b AS (SELECT CAST("doc_id" AS BIGINT) AS id, "text" AS t,
       |   length("text") AS len FROM $table WHERE length("text") >= $k),
       | seg AS (SELECT id AS id_b, t AS t_b, len AS len_b, i,
       |   substr(t, CAST(CASE WHEN i < $k - (len % $k) THEN i * (len // $k)
       |     ELSE ($k - (len % $k)) * (len // $k)
       |       + (i - ($k - (len % $k))) * ((len // $k) + 1) END + 1 AS INTEGER),
       |     CAST(CASE WHEN i < $k - (len % $k) THEN len // $k
       |       ELSE (len // $k) + 1 END AS INTEGER)) AS s
       |   FROM b CROSS JOIN range(0, $k) r(i)),
       | pl AS (SELECT id AS id_a, t AS t_a, len AS len_a,
       |   CAST(len - off AS BIGINT) AS l
       |   FROM b CROSS JOIN range(0, $k) o(off)
       |   WHERE len - off >= $k),
       | pw AS (SELECT id_a, t_a, len_a, l, i,
       |   CASE WHEN i < $k - (l % $k) THEN i * (l // $k)
       |     ELSE ($k - (l % $k)) * (l // $k)
       |       + (i - ($k - (l % $k))) * ((l // $k) + 1) END AS p,
       |   CASE WHEN i < $k - (l % $k) THEN l // $k
       |     ELSE (l // $k) + 1 END AS w
       |   FROM pl CROSS JOIN range(0, $k) r(i)),
       | pr AS (SELECT id_a, t_a, len_a, l, i,
       |   substr(t_a, CAST(p + o2 + 1 AS INTEGER), CAST(w AS INTEGER)) AS seg
       |   FROM pw CROSS JOIN range(${-tau}, ${tau + 1}) g2(o2)
       |   WHERE p + o2 >= 0 AND p + o2 <= len_a - w),
       | cand AS (SELECT DISTINCT least(pr.id_a, seg.id_b) AS doc_a,
       |     greatest(pr.id_a, seg.id_b) AS doc_b, pr.t_a, seg.t_b
       |   FROM pr JOIN seg ON pr.l = seg.len_b AND pr.i = seg.i
       |     AND pr.seg = seg.s AND pr.id_a <> seg.id_b),
       | v AS (SELECT doc_a, doc_b,
       |     CAST(levenshtein(t_a, t_b) AS BIGINT) AS dist FROM cand)
       | SELECT doc_a AS "doc_a", doc_b AS "doc_b", dist AS "dist"
       | FROM v WHERE dist <= $tau""".stripMargin.replace("\n", " ")
  }
}
