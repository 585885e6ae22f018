package graft.silver

import graft.SparkSpec

/** [[Cdc.apply]]/[[Cdc.merge]]: latest-wins, delete tombstones,
  * tie-break by tie column, base-loses-ties merge semantics.
  */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  // (key, ts, tie, op, v)
  private def log = Seq(
    (1L, 10L, 1L, "U", "a"),
    (1L, 20L, 2L, "U", "b"),   // latest for key 1 -> b
    (2L, 10L, 3L, "U", "c"),
    (2L, 20L, 4L, "D", "-"),   // deleted
    (3L, 10L, 5L, "D", "-"),
    (3L, 20L, 6L, "U", "d"),   // resurrected after delete
    (4L, 10L, 7L, "U", "e"),
    (4L, 10L, 8L, "U", "f")    // same ts: greater tie wins -> f
  ).toDF("k", "ts", "tie", "op", "v")

  private def result(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("latest change wins; deletes tombstone; resurrect after delete; ties by tie col") {
    val got = result(Cdc.apply(log, "k", "ts", "tie", "op", Seq("v")))
    assert(got === Map(1L -> "b", 3L -> "d", 4L -> "f"))
  }

  test("merge: base rows lose same-ts ties to log entries; untouched keys survive") {
    val base = Seq((1L, 5L, "base1"), (9L, 5L, "base9"), (2L, 20L, "base2"))
      .toDF("k", "ts", "v")
    val cl = Seq(
      (1L, 20L, 1L, "U", "log1"),  // beats base1 (later ts)
      (2L, 20L, 2L, "D", "-"))     // SAME ts as base2: log wins -> delete
      .toDF("k", "ts", "tie", "op", "v")
    val got = result(Cdc.merge(base, cl, "k", "ts", "tie", "op", Seq("v")))
    assert(got === Map(1L -> "log1", 9L -> "base9"))
  }

  test("partitioning-invariant survivor set") {
    val a = result(Cdc.apply(log, "k", "ts", "tie", "op", Seq("v")))
    val b = result(Cdc.apply(log.repartition(7), "k", "ts", "tie", "op", Seq("v")))
    assert(a === b)
  }
}
