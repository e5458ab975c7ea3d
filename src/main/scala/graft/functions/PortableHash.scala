package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic hashing for the dedup/fingerprint operators.
  *
  * Spark's native `xxhash64`/`hash` are the production path (codegen'd,
  * fast), but no other engine reproduces them — so every operator built on
  * them would be unverifiable against the DuckDB oracle. This "portable"
  * family is plain integer arithmetic over ASCII codes — identical
  * semantics in any SQL engine with higher-order list functions — and the
  * SQL twins are generated from the same constants so Spark and oracle
  * can't drift.
  *
  * All arithmetic stays below 2^63: values are reduced mod
  * [[PortableHash.P]] (≈2^30) before multiplication by constants ≤ P, so
  * products stay ≤ ~2^60 (DuckDB errors on BIGINT overflow; Spark would
  * silently wrap — both avoided).
  *
  * Production note (100 TB): the polynomial char fold is O(len) per row and
  * fully codegen'd (Catalyst higher-order functions), but ~3-4× slower than
  * `xxhash64`. Operators take the hash as a parameter: portable for
  * verification, `xxhash64` for scale runs.
  */
object PortableHash {

  /** Modulus: largest common 31-bit prime. */
  val P = 1000000007L

  /** Multiplier of the character fold (Horner / rolling hash). */
  val B = 31L

  /** Per-character codepoints of a string, empties filtered (Spark's
    * `split(s, "")` keeps a trailing empty token; DuckDB's does not).
    */
  private def charCodes(c: Column): Column =
    transform(filter(split(c, ""), ch => ch =!= lit("")), ch => ascii(ch))

  /** Polynomial rolling hash of a string → [0, P). Horner fold,
    * left-to-right — the same association order as DuckDB's
    * `list_reduce`, so results are bit-identical.
    */
  def polyHash(c: Column): Column =
    aggregate(charCodes(c), lit(0L),
      (acc, code) => (acc * B + code.cast("long")) % P)

  /** DuckDB twin of [[polyHash]]. `list_prepend(0, ...)` seeds the reduce
    * with the same 0 accumulator Spark's `aggregate` starts from (and
    * keeps `list_reduce` total on empty strings).
    */
  def polyHashSql(e: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split_regex($e, ''), ch -> CAST(ascii(ch) AS BIGINT))), " +
      s"(acc, code) -> (acc * $B + code) % $P)"

  /** j-th universal-family hash of an integer x ∈ [0, P):
    * h_j(x) = (a_j·x + b_j) mod P with a_j, b_j derived from j by fixed
    * arithmetic (a_j never 0 for j ≥ 1).
    */
  def affine(j: Column, x: Column): Column =
    ((j.cast("long") * 40503L + 17L) % P * x % P + (j.cast("long") * 97L + 1L) % P) % P

  /** DuckDB twin of [[affine]]. */
  def affineSql(j: String, x: String): String =
    s"((($j * 40503 + 17) % $P) * $x % $P + ($j * 97 + 1) % $P) % $P"

  /** Fold an array of longs into one hash (band/signature combiner). */
  def combine(arr: Column): Column =
    aggregate(arr, lit(0L), (acc, v) => (acc * B + v % P) % P)

  /** DuckDB twin of [[combine]]. */
  def combineSql(e: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), $e), " +
      s"(acc, v) -> (acc * $B + v % $P) % $P)"
}
