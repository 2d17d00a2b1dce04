package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Deterministic, engine-portable hash columns.
  *
  * The dedup/similarity operators need a numeric hash whose value is
  * reproducible in ANY engine (the correctness oracle runs the same
  * algorithm in DuckDB). Engine-native hashes (`xxhash64`, murmur) differ
  * across engines, so we standardize on md5 and surface its *lower 8 bytes
  * in little-endian byte order* — exactly DuckDB's `md5_number_lower()` —
  * built here from hex-substring swaps + `conv`.
  *
  * All expressions are pure `functions._` compositions: they stay inside
  * whole-stage codegen (no UDF), so the hash is evaluated per-row in
  * generated code with zero serialization overhead — safe for the 100 TB
  * path.
  */
object CrossHash {

  /** Lower-8-bytes-little-endian md5 as an unsigned 64-bit value carried in
    * DECIMAL(20,0) (a signed long cannot hold it). DuckDB equivalent:
    * `CAST(md5_number_lower(s) AS DECIMAL(20,0))`.
    */
  def md5u64(c: Column): Column =
    conv(swappedLowHex(c), 16, 10).cast(DecimalType(20, 0))

  /** 60-bit variant that fits a signed long: drop the low nibble.
    * DuckDB equivalent: `CAST(md5_number_lower(s) >> 4 AS BIGINT)`.
    */
  def md5u60(c: Column): Column =
    conv(substring(swappedLowHex(c), 1, 15), 16, 10).cast(LongType)

  /** Hex of md5's lower 8 bytes, byte-swapped to little-endian order. */
  private def swappedLowHex(c: Column): Column = {
    val h = md5(c)
    concat((7 to 0 by -1).map(i => substring(h, 17 + 2 * i, 2)): _*)
  }

  /** Salted 60-bit hash — the MinHash permutation family. Same string
    * construction must be used in the oracle: `s || '#' || seed`.
    */
  def md5u60Salted(c: Column, seed: Int): Column =
    md5u60(concat(c, lit("#" + seed)))
}
