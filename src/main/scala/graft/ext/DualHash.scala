package graft.ext

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.lit

/** Dual-compilable (Spark + DuckDB) hash family for the dedup / ANN
  * pipelines, replacing `xxhash64` (which DuckDB cannot evaluate — the
  * whole MinHash/SimHash family was previously rows-only in the
  * correctness gate).
  *
  * Construction, identical arithmetic on both engines:
  *
  *  - '''base60''': the first 15 hex nibbles (60 bits) of `md5(bytes)` as
  *    a non-negative BIGINT. md5 produces the same lowercase hex string in
  *    Spark (`md5(CAST(x AS BINARY))`) and DuckDB (`md5(VARCHAR)`) for the
  *    same UTF-8 bytes; 15 nibbles keep the value under 2^60 so every
  *    later product stays inside checked signed-64 arithmetic (DuckDB
  *    RAISES on BIGINT overflow rather than wrapping — constants below are
  *    sized so no intermediate exceeds ~2^62).
  *  - '''affine families''' for MinHash: `h_i(x) = (A_i * (x mod P) + B_i)
  *    mod P` over the Mersenne prime P = 2^31 - 1; a standard pairwise-
  *    independent family. `A_i < P` and `x mod P < P` bound the product by
  *    P^2 < 2^62.
  *  - '''ordered combine''' for LSH band keys: a P-modular Horner fold
  *    with the MINSTD multiplier.
  *
  * md5 is a stronger (and slightly slower) base hash than xxhash64; at
  * 100 TB the cost is per-shingle CPU inside an otherwise shuffle-free
  * projection and is dwarfed by the band-bucket shuffle it feeds.
  */
object DualHash {

  /** Mersenne prime 2^31 - 1: modulus of the affine families. */
  val P: Long = 2147483647L

  /** MINSTD multiplier for the ordered combine fold. */
  val CombineA: Long = 48271L

  /** Multiplier of affine family `i` (odd spread via Knuth's 2^32/phi). */
  def famA(i: Int): Long = (2654435769L * (i + 1)) % (P - 1) + 1

  /** Offset of affine family `i`. */
  def famB(i: Int): Long = (2245822107L * i.toLong) % P

  private val localDigest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 15 hex nibbles of md5(bytes): nibbles 0-14 = the big-endian
    * 64-bit value of digest bytes 0-7 shifted right by one nibble. */
  def base60(bytes: Array[Byte]): Long = {
    val md = localDigest.get()
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  def base60(s: String): Long = base60(s.getBytes(StandardCharsets.UTF_8))

  /** Affine family member i applied to a base hash. */
  def family(i: Int, x: Long): Long = (famA(i) * (x % P) + famB(i)) % P

  /** Order-dependent Horner combine of values (each already < P) mod P. */
  def combine(seed: Long, vs: Iterable[Long]): Long =
    vs.foldLeft(seed)((h, v) => (h * CombineA + v) % P)

  /** Column form of [[combine]] — plain long arithmetic, codegen'd. */
  def combineCol(seed: Column, vs: Seq[Column]): Column =
    vs.foldLeft(seed)((h, v) => (h * lit(CombineA) + v) % lit(P))

  // ---- DuckDB SQL renderings of the SAME arithmetic -----------------------

  /** `base60` over a VARCHAR expression. */
  def base60Sql(inner: String): String =
    s"CAST(concat('0x', substr(md5($inner), 1, 15)) AS BIGINT)"

  /** `family(i, _)` over a BIGINT expression. */
  def familySql(i: Int, x: String): String =
    s"((${famA(i)} * (($x) % $P) + ${famB(i)}) % $P)"

  /** `combine(seed, vs)` over BIGINT expressions. */
  def combineSql(seed: String, vs: Seq[String]): String =
    vs.foldLeft(seed)((h, v) => s"((($h) * $CombineA + ($v)) % $P)")
}
