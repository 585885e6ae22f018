package graft.queries

import graft.SparkSpec

/** Pins the stream-start scoping contract (round-17 changes #4–#6):
  * every gate's stream now starts under `withStateParts`, so the
  * helper must (a) expose the scoped value only inside the body,
  * (b) restore the session's setting on both exit paths, and
  * (c) return the body's value — a broken restore would silently
  * re-shape every BATCH plan that runs after a streaming gate.
  */
class WithStatePartsSpec extends SparkSpec {

  private val key = "spark.sql.shuffle.partitions"

  test("scopes the shuffle-partition conf to the body and restores it") {
    val prior = spark.conf.get(key)
    assert(prior != "8", "suite base must differ from the scoped default")
    val inside = StreamingQueries.withStateParts(spark) { spark.conf.get(key) }
    assert(inside == "8") // SPARK_GRAFT_STREAM_PARTS unset in the suite
    assert(spark.conf.get(key) == prior)
  }

  test("restores the conf when the body throws") {
    val prior = spark.conf.get(key)
    intercept[RuntimeException] {
      StreamingQueries.withStateParts(spark) { sys.error("boom") }
    }
    assert(spark.conf.get(key) == prior)
  }

  test("returns the body's value") {
    assert(StreamingQueries.withStateParts(spark)(41 + 1) == 42)
  }
}
