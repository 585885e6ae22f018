package graft.streaming

import java.sql.Timestamp

/** Shared event-time arithmetic for the streaming operators — one
  * definition so the batch-parity twins can never drift on
  * sub-millisecond handling.
  */
object EventTime {
  /** Epoch micros of a Timestamp (ms grain + the sub-ms nanos). */
  def micros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000) / 1000L
}
