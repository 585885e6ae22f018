package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE engine hash family — single-sourced so no copy can drift from
  * the DuckDB oracle conventions:
  *  - [[h60]]: 60-bit BIGINT from the first 15 md5 hex chars;
  *    SQL mirror `('0x' || substr(md5(x), 1, 15))::BIGINT`.
  *  - [[halves]]: two 32-bit BIGINTs from hex chars 1-8 / 9-16 — the
  *    Kirsch-Mitzenmacher double-hashing pair (MinHash signatures,
  *    Bloom positions); SQL mirror
  *    `('0x' || substr(md5(x), 1, 8))::BIGINT` etc.
  * Every gate that hash-matches signatures/buckets/sketches depends
  * on these exact slices staying put.
  */
object Md5Hash {

  /** 60-bit non-negative hash of the column's value. */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** 60-bit hash of the CANONICAL STRING form (profiling over mixed
    * column types; BIGINT 123 and VARCHAR '123' collide by design —
    * matches `CAST(x AS VARCHAR)` on the oracle side).
    */
  def h60String(c: Column): Column = h60(c.cast("string"))

  /** (ha, hb) 32-bit double-hashing pair of the canonical string. */
  def halves(c: Column): (Column, Column) = (
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long"),
    conv(substring(md5(c.cast("string")), 9, 8), 16, 10).cast("long"))
}
