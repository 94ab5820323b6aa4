package graft

import graft.ext.EditDistJoin

/** PassJoin edit-distance join laws: candidate COMPLETENESS against a
  * driver-side brute force (the pigeonhole argument made executable),
  * planted-edit detection at segment boundaries, and the canonical
  * segment arithmetic. */
class EditDistJoinSpec extends SparkSpec {

  import spark.implicits._

  /** Classic Levenshtein DP — the reference for both engines' builtin. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(b.length + 1)(identity)
    for (i <- 1 to a.length) {
      var prev = d(0); d(0) = i
      for (j <- 1 to b.length) {
        val cur = d(j)
        d(j) = math.min(math.min(d(j) + 1, d(j - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    d(b.length)
  }

  test("canonical segments partition the string: widths differ by at " +
      "most 1, concatenation is the identity") {
    for (len <- Seq(5, 7, 12, 100, 101, 104); k <- Seq(2, 3, 5)) {
      val segs = EditDistJoin.segments(len, k)
      assert(segs.length == k)
      assert(segs.map(_._2).sum == len)
      assert(segs.map(_._2).max - segs.map(_._2).min <= 1)
      assert(segs.head._1 == 0)
      assert(segs.sliding(2).forall {
        case Seq((s1, w1), (s2, _)) => s2 == s1 + w1; case _ => true })
    }
  }

  private def brute(docs: Seq[(Long, String)], tau: Int) =
    (for {
      (ia, ta) <- docs; (ib, tb) <- docs
      if ia < ib && ta.length >= tau + 1 && tb.length >= tau + 1
      d = lev(ta, tb) if d <= tau
    } yield (ia, ib, d.toLong)).toSet

  test("completeness vs brute force: every pair within tau is found, " +
      "nothing else (tau = 1, 2, 4)") {
    // small vocab + planted edits at segment starts/ends/boundaries —
    // the positions the shift window must cover
    val baseStr = "the quick brown fox jumps over the lazy dog again and again"
    val docs: Seq[(Long, String)] = Seq(
      0L -> baseStr,
      1L -> baseStr.replace("quick", "quack"), // 1 substitution
      2L -> ("x" + baseStr), // 1 insertion at position 0
      3L -> baseStr.dropRight(2), // 2 deletions at the end
      4L -> baseStr.patch(20, "XY", 2), // 2 substitutions mid-string
      5L -> ("ab" + baseStr.drop(3)), // edits at the first segment
      6L -> baseStr.patch(30, "", 3), // 3-char deletion straddling a boundary
      7L -> "completely different text with no resemblance whatsoever here",
      8L -> baseStr.reverse,
      9L -> (baseStr + " xyz"), // 4 insertions (space + 3)
      10L -> "tiny") // shorter than tau+1 for tau=4? len 4 < 5: filtered
    val df = docs.toDF("doc_id", "text")
    for (tau <- Seq(1, 2, 4)) {
      val got = EditDistJoin.selfJoin(df, tau).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == brute(docs, tau),
        s"tau=$tau: got $got\nwant ${brute(docs, tau)}")
    }
  }

  test("randomized completeness: mutated copies at known distances are " +
      "all recovered") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdef "
    def randStr(n: Int) =
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    def mutate(s: String, edits: Int): String = {
      var t = s
      for (_ <- 1 to edits) {
        val p = rnd.nextInt(t.length)
        rnd.nextInt(3) match {
          case 0 => t = t.patch(p, alphabet(rnd.nextInt(7)).toString, 1)
          case 1 => t = t.patch(p, "", 1)
          case _ => t = t.patch(p, alphabet(rnd.nextInt(7)).toString, 0)
        }
      }
      t
    }
    val origs = (0 until 12).map(i => i.toLong -> randStr(40 + rnd.nextInt(40)))
    val muts = origs.zipWithIndex.map { case ((id, s), i) =>
      (100L + id) -> mutate(s, 1 + i % 3) }
    val docs = origs ++ muts
    val tau = 3
    val got = EditDistJoin.selfJoin(docs.toDF("doc_id", "text"), tau)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == brute(docs, tau))
    // every planted (orig, mutant) pair with true distance <= tau found
    for (((id, s), (mid, m)) <- origs.zip(muts) if lev(s, m) <= tau)
      assert(got.contains((id, mid, lev(s, m).toLong)),
        s"planted pair ($id, $mid) at distance ${lev(s, m)} missed")
  }

  test("candidate exchanges carry NO string column: the tau-squared " +
      "fan-out shuffles only (id, len, i, xxhash64(seg)) fixed-width rows") {
    import org.apache.spark.sql.functions._
    val base = Seq(0L -> "the quick brown fox", 1L -> "the quick brown fix")
      .toDF("doc_id", "text")
      .select(col("doc_id").as("id"), col("text").as("t"),
        length(col("text")).as("len"))
      .where(col("len") >= 3)
    val cand = EditDistJoin.candidatePairs(base, tau = 2)
    val fmt = cand.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val exchInputs =
      """(?s)\(\d+\) Exchange.*?Input \[\d+\]: \[(.*?)\]""".r
    val inputs = exchInputs.findAllMatchIn(fmt).map(_.group(1)).toSeq
    assert(inputs.nonEmpty, s"no Exchange found in candidate plan:\n$fmt")
    val stringAttr = """(^|[,\s\(])(t|t_a|t_b|seg)#""".r
    for (attrs <- inputs)
      assert(stringAttr.findFirstIn(attrs).isEmpty,
        s"text/segment string rides the candidate exchange: [$attrs]\n$fmt")
  }
}
