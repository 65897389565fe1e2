package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** The cross-engine string-hash family shared by the hash-GATED
  * minhash/simhash twins (#188/#189) and their DuckDB oracles: the
  * 31-base polynomial over Unicode CODE POINTS mod a public prime —
  * the #176 winnow family, proven bit-reproducible in DuckDB list
  * lambdas (`list_reduce` over `string_split(s,'') → ascii`). Two
  * primes give two decorrelated ~30-bit draws per string; the MINSTD
  * (Park–Miller 1988) stream supplies the (a, b) universal-hash
  * constants for the minhash slots, embedded as literals in BOTH
  * engines (the oracle SQL is built from these same arrays).
  *
  * The production flavors (#27/#28) keep xxhash64 — a better-mixed
  * family; these exist so the LSH pipelines have a driver-visible
  * hash gate, not just rows-only. Reference for the LSH semantics:
  * Broder 1997 (minhash), Charikar 2002 (simhash).
  */
object PolyHash {
  /** Primary prime (the #176 winnow modulus). */
  val Mod1 = 1000000007L
  /** Secondary prime (NTT prime 998244353 — public, < 2^30). */
  val Mod2 = 998244353L
  /** 2^30 — shifts the Mod2 draw clear of the Mod1 draw's 30 bits. */
  val Shift2 = 1073741824L

  /** Horner fold base `base` mod `mod` over the string's code points —
    * the exact recurrence `(acc * base + cp) % mod` the oracle replays.
    */
  def fold(s: UTF8String, base: Long, mod: Long): Long = {
    val str = s.toString
    var acc = 0L
    var idx = 0
    while (idx < str.length) {
      val cp = str.codePointAt(idx)
      acc = (acc * base + cp) % mod
      idx += Character.charCount(cp)
    }
    acc
  }

  /** The MINSTD stream x_{n+1} = 48271·x_n mod (2^31 − 1), x_0 = 1,
    * paired into per-slot universal-hash constants: a_i ∈ [1, p−1]
    * (never 0 — a zero multiplier collapses the slot), b_i ∈ [0, p−1].
    * Both the [[MinHashPolySig]] expression and the #188 oracle SQL
    * interpolate from this one definition.
    */
  def abPairs(k: Int): (Array[Long], Array[Long]) = {
    val a = new Array[Long](k)
    val b = new Array[Long](k)
    var x = 1L
    def next(): Long = { x = (x * 48271L) % 2147483647L; x }
    var i = 0
    while (i < k) {
      a(i) = next() % (Mod1 - 1) + 1
      b(i) = next() % Mod1
      i += 1
    }
    (a, b)
  }
}
