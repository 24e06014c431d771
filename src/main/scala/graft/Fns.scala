package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic helpers shared by queries and their DuckDB
  * oracles.
  *
  * `round(x, n)` is NOT portable for doubles: Spark rounds the shortest
  * decimal rendering HALF_UP while DuckDB rounds the raw binary value, so
  * the ubiquitous `price * (1 - discount)` values (exact at 4 decimals,
  * i.e. half-way at 2) diverge systematically. [[money]] uses only
  * IEEE-exact primitives (`*`, `+`, `floor`, `/`) that both engines
  * evaluate bit-identically, and rounds at 4 decimals where money values
  * sit ON the grid rather than on a rounding boundary.
  */
object Fns {

  /** Deterministic 4-decimal rounding: floor(x*1e4 + 0.5) / 1e4.
    * Oracle-side equivalent: [[moneySql]]. */
  def money(c: Column): Column =
    floor(c * lit(10000.0) + lit(0.5)) / lit(10000.0)

  /** DuckDB-dialect rendering of [[money]]. */
  def moneySql(expr: String): String =
    s"floor(($expr) * 10000 + 0.5) / 10000"

  /** Order-independent sum of money-valued doubles: accumulate as
    * DECIMAL(38,8) (exact — parallel/partial aggregation order cannot
    * change the result, unlike double sums which differ in the last ulp
    * between engines), then return to double at the output boundary.
    * Inputs here are exact at ≤6 decimals, so the 8-decimal cast is
    * unambiguous in both engines. Oracle-side: [[sumMoneySql]]. */
  def sumMoney(c: Column): Column =
    sum(c.cast("decimal(38,8)")).cast("double")

  /** DuckDB-dialect rendering of [[sumMoney]]. */
  def sumMoneySql(expr: String): String =
    s"CAST(sum(CAST(($expr) AS DECIMAL(38,8))) AS DOUBLE)"

  /** Deterministic string→int64 hash shared with DuckDB: first 15 hex
    * chars of md5 as a base-16 integer (60 bits, non-negative).
    * Oracle-side equivalent: [[h64Sql]]. */
  def h64(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** DuckDB-dialect rendering of [[h64]]. */
  def h64Sql(expr: String): String =
    s"(('0x' || substr(md5($expr), 1, 15))::BIGINT)"

  /** Driver-side [[h64]] of a literal string (for test expectations). */
  def h64Literal(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  // ---- portable-HLL building blocks (shared SQL text, both dialects) ----
  // The h64 hash leaves a 54-bit sub-hash after the 64-way bucket split
  // (60 bits − 6). Register math is ALL-INTEGER so Spark and DuckDB agree
  // bit-for-bit: rank via an unrolled threshold ladder (no log2 — not
  // correctly rounded cross-engine), register weight 2^(55−rank) via a
  // literal ladder (no pow — same reason). Plain decimal literals parse
  // as BIGINT-compatible integers in both dialects.

  /** Rank (position of the highest set bit from the top of the 54-bit
    * field, 1-based; 55 for w=0) as a dialect-neutral CASE ladder. */
  def hllRankSql(w: String): String =
    (53 to 0 by -1).map(b => s"WHEN $w >= ${1L << b} THEN ${54 - b}")
      .mkString("CASE ", " ", " ELSE 55 END")

  /** 2^(55−rank) as a dialect-neutral literal ladder — the register's
    * contribution to the harmonic sum, scaled by 2^55 to stay integer. */
  def hllWeightSql(r: String): String =
    (1 to 55).map(rv => s"WHEN $rv THEN ${1L << (55 - rv)}")
      .mkString(s"CASE $r ", " ", " ELSE 0 END")

  /** 2^55 — the scaled weight of an EMPTY register (rank 0, 2^-0 = 1). */
  val HllEmptyWeight: Long = 1L << 55
}
