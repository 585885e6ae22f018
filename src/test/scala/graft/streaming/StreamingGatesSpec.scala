package graft.streaming

import org.apache.spark.sql.Row

import graft.SparkSpec
import graft.SparkEntry

/** The driver-surface streaming-parity gates (st01/st02) must equal
  * their batch twins (p33/p37) row for row on real driver data — the
  * same comparison the DuckDB oracle hash runs at sf0.01, pinned here
  * at sf0.001 so `sbt test` catches a parity break before the driver
  * does.
  */
class StreamingGatesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rows(name: String): Set[Row] =
    SparkEntry.queries(name)(spark, dir).collect().toSet

  test("st01_streaming_sessions == p33_sessionize on sf0.001") {
    val streamed = rows("st01_streaming_sessions")
    val batch = rows("p33_sessionize")
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("st02_streaming_funnel == p37_funnel on sf0.001") {
    val streamed = rows("st02_streaming_funnel")
    val batch = rows("p37_funnel")
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }
}
