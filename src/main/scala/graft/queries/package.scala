package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {
  /** Driver contract: (session, sf-dir) => result frame. */
  type Q = (SparkSession, String) => DataFrame
}

package queries {
  /** One gate-checked query: a Spark implementation plus (when the
    * semantics are ANSI-SQL-expressible) the DuckDB oracle that must
    * hash-match it. `oracle = None` ==> the driver records a weaker
    * rows-only check (used for hash-seeded randomized ops like
    * MinHash/LSH whose exact outputs are engine-specific).
    */
  final case class QueryDef(name: String, fn: Q, oracle: Option[String])
}
