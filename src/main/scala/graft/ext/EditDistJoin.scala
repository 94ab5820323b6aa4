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
  *    keyed (len, segment_index, segment) — τ+1 rows per doc;
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
  * Scale shape — NOTHING document-sized crosses the candidate shuffle:
  * both explode sides project the segment down to its `xxhash64` before
  * the exchange, so a probe row is (id, ℓ, i, hash) = four fixed-width
  * columns and the τ² fan-out costs ~24 bytes/row REGARDLESS of document
  * length (emitting the segment string itself would shuffle ~len/(τ+1)
  * bytes × 637 rows ≈ 91× the corpus's text bytes at τ=6 — the classic
  * PassJoin-at-scale mistake). A 64-bit hash collision can only ADD a
  * candidate, never lose one (true segment equality ⟹ hash equality,
  * so pigeonhole completeness is untouched), and every candidate is
  * verified by the banded Levenshtein after the texts are fetched back
  * by TWO id equi-joins — the text shuffles exactly once per side, keyed
  * by id, the same "text never rides the fan-out" discipline as the
  * MinHash/SimHash family (Dedup.scala). Candidate pairs are DISTINCT-ed
  * as bare (long, long) ids before the fetch, so each pair verifies once.
  * Hot segments (a popular exact substring) concentrate one join key;
  * the fan-out constant (τ+1)²·(2τ+1) is the documented PassJoin cost
  * (τ is small — this is a near-dup operator, not a fuzzy search).
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

  private def segStart(k: Int)(lenC: Column, i: Column): Column = {
    val b = (lenC / k).cast("int")
    val rem = lenC % k
    // first (k - rem) segments are width b: start = i*b for i < k-rem,
    // else (k-rem)*b + (i-(k-rem))*(b+1)
    when(i < lit(k) - rem, i * b)
      .otherwise((lit(k) - rem) * b + (i - (lit(k) - rem)) * (b + 1))
  }

  private def segWidth(k: Int)(lenC: Column, i: Column): Column = {
    val b = (lenC / k).cast("int")
    val rem = lenC % k
    when(i < lit(k) - rem, b).otherwise(b + 1)
  }

  /** The normalised candidate id pairs — the ONLY part of the operator
    * that shuffles at the τ² fan-out, and every column in it is
    * fixed-width (no text, no segment strings: segments travel as their
    * xxhash64). `base` must carry (id: long, t: string, len: int) with
    * len ≥ tau+1 already enforced. Exposed for the plan-audit law that
    * pins "no string column in the candidate exchange". */
  private[graft] def candidatePairs(base: DataFrame, tau: Int): DataFrame = {
    val k = tau + 1
    val segIdx = explode(sequence(lit(0), lit(k - 1))).as("i")

    // index side: the τ+1 canonical segments of every doc, hashed before
    // anything shuffles. Segment boundaries depend only on len — computed
    // as integer arithmetic over the segment index inside one bounded
    // explode; the projection drops the text in the same select that
    // consumes it.
    val index = base
      .select(col("id").as("id_b"), col("t"), col("len").as("len_b"), segIdx)
      .select(col("id_b"), col("len_b"), col("i"),
        xxhash64(col("t").substr(
          segStart(k)(col("len_b"), col("i")) + 1,
          segWidth(k)(col("len_b"), col("i")))).as("segh"))

    // probe side: for every partner length ℓ in [len-τ, len] (partner
    // is the shorter side; ℓ ≥ k so its segments are non-empty) and
    // every segment index, the substrings at the canonical start plus a
    // shift window — hashed in the projection that drops the text.
    //
    // Multi-match-aware shift window (Li 2012 §4): it is complete to
    // cover every true pair through its FIRST surviving segment i, whose
    // shift δ must satisfy  max(i, |δ|) + |Δ − δ| ≤ τ  (Δ = len_a − ℓ):
    // the edits before i number ≥ i (all earlier segments are touched)
    // and ≥ |δ| (the shift is net indels before), the edits after number
    // ≥ |Δ − δ| (the tail length mismatch), and they total ≤ τ. The
    // feasible δ form the interval
    //   [max(−⌊(τ−Δ)/2⌋, i+Δ−τ), min(⌊(τ+Δ)/2⌋, τ−i+Δ)]
    // — ~2.5× fewer probe rows than the naive |δ| ≤ τ window at τ = 6
    // (completeness stays pinned by EditDistJoinSpec's brute-force law).
    val probe = base
      .select(col("id").as("id_a"), col("t"), col("len").as("len_a"),
        explode(sequence(greatest(col("len") - tau, lit(k)), col("len")))
          .as("l"))
      .select(col("id_a"), col("t"), col("len_a"), col("l"), segIdx)
      .select(col("id_a"), col("t"), col("len_a"), col("l"), col("i"),
        segStart(k)(col("l"), col("i")).as("p"),
        segWidth(k)(col("l"), col("i")).as("w"),
        (col("len_a") - col("l")).cast("int").as("d"))
      .select(col("id_a"), col("t"), col("l"), col("i"), col("w"),
        explode(sequence(
          greatest(
            col("p") + greatest(
              -((lit(tau) - col("d")) / 2).cast("int"),
              col("i") + col("d") - lit(tau)),
            lit(0)),
          least(
            col("p") + least(
              ((lit(tau) + col("d")) / 2).cast("int"),
              lit(tau) - col("i") + col("d")),
            col("len_a") - col("w")))).as("s"))
      .select(col("id_a"), col("l"), col("i"),
        xxhash64(col("t").substr(col("s") + 1, col("w"))).as("segh"))

    probe.join(index,
        probe("l") === index("len_b") && probe("i") === index("i") &&
          probe("segh") === index("segh") && probe("id_a") =!= index("id_b"))
      .select(
        least(col("id_a"), col("id_b")).as("doc_a"),
        greatest(col("id_a"), col("id_b")).as("doc_b"))
      .distinct()
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

    // verify-after-fetch: the distinct bare id pairs join the docs
    // relation twice by id (the only exchanges that carry text, each
    // corpus-sized), then the banded Levenshtein decides.
    val texts = base.select(col("id"), col("t"))
    candidatePairs(base, tau)
      .join(texts.select(col("id").as("doc_a"), col("t").as("t_a")), "doc_a")
      .join(texts.select(col("id").as("doc_b"), col("t").as("t_b")), "doc_b")
      .withColumn("dist", levenshtein(col("t_a"), col("t_b"), tau)
        .cast("long"))
      .where(col("dist") >= 0 && col("dist") <= tau)
      .select(col("doc_a"), col("doc_b"), col("dist"))
  }

  /** DuckDB rendering of [[selfJoin]], stage for stage: the same
    * canonical segment arithmetic (integer // and %), the probe windows
    * as bounded offset cross-joins (DuckDB 1.0 does not take lateral
    * column args in generate_series — `len - off`/`p + off` with a
    * WHERE clamp emits the identical index sets), the same
    * distinct-bare-id-pairs-then-fetch-then-verify with DuckDB's
    * levenshtein (identical classic DP — unit costs, no transposition).
    * The oracle joins on the raw segment string where the engine joins
    * on xxhash64(segment) — result-identical, because hash equality is
    * implied by string equality (no true pair lost) and any
    * collision-only candidate must still pass the lev ≤ τ verification
    * both engines share. */
  def selfJoinOracleSql(table: String, tau: Int): String = {
    val k = tau + 1
    s"""WITH b AS (SELECT CAST("doc_id" AS BIGINT) AS id, "text" AS t,
       |   length("text") AS len FROM $table WHERE length("text") >= $k),
       | seg AS (SELECT id AS id_b, len AS len_b, i,
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
       | pr AS (SELECT id_a, l, i,
       |   substr(t_a, CAST(p + o2 + 1 AS INTEGER), CAST(w AS INTEGER)) AS seg
       |   FROM pw CROSS JOIN range(${-tau}, ${tau + 1}) g2(o2)
       |   WHERE p + o2 >= 0 AND p + o2 <= len_a - w
       |     AND o2 >= greatest(-(($tau - (len_a - l)) // 2),
       |       i + (len_a - l) - $tau)
       |     AND o2 <= least((($tau + (len_a - l)) // 2),
       |       $tau - i + (len_a - l))),
       | cand AS (SELECT DISTINCT least(pr.id_a, seg.id_b) AS doc_a,
       |     greatest(pr.id_a, seg.id_b) AS doc_b
       |   FROM pr JOIN seg ON pr.l = seg.len_b AND pr.i = seg.i
       |     AND pr.seg = seg.s AND pr.id_a <> seg.id_b),
       | v AS (SELECT c.doc_a, c.doc_b,
       |     CAST(levenshtein(ta.t, tb.t) AS BIGINT) AS dist
       |   FROM cand c JOIN b ta ON ta.id = c.doc_a
       |     JOIN b tb ON tb.id = c.doc_b)
       | SELECT doc_a AS "doc_a", doc_b AS "doc_b", dist AS "dist"
       | FROM v WHERE dist <= $tau""".stripMargin.replace("\n", " ")
  }
}
