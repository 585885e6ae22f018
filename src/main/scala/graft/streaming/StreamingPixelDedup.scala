package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** ONLINE content-level image dedup — the streaming face of
  * [[graft.pipeline.Multimodal.dedupByPixelHash]] and the multimodal
  * sibling of [[StreamingCuration.embeddingNearDupKeepers]]: media
  * arrive as a stream, each decodes IN-SCAN to its pixel_md5 (same
  * per-partition codec seam as the batch operator — pixels never
  * leave the scan task, state and shuffle carry a 32-char hash), and
  * the first arrival of each decoded content wins its hash bucket;
  * later lossless re-encodes / transcodes of the same pixels drop,
  * regardless of container bytes.
  *
  * Claimant determinism: within a micro-batch the winner is the
  * minimal (event time, media_id) — never iterator order — and state
  * is one boolean per in-horizon hash with an event-time timeout, so
  * replays elect the same keepers (the st31 gate hash-checks against
  * a batch-SQL oracle). Undecodable payloads QUARANTINE as flagged
  * keepers with a synthetic unique key (a broken camera feed must
  * not elect itself claimant of one hash and drop later well-formed
  * images), mirroring the embedding path's contract.
  *
  * State bound: one boolean per DISTINCT in-horizon image content —
  * the dedup-decision minimum; a million byte-distinct copies of one
  * image cost one state entry.
  */
object StreamingPixelDedup {

  case class PixelObs(media_id: Long, ingested_at: Timestamp,
      pixel_md5: Option[String])

  case class PixelVerdict(media_id: Long, ingested_at: Timestamp,
      keeper: Boolean, quarantined: Boolean)

  /** Keeper/drop verdicts for a media stream with columns
    * (media_id, payload, `eventTimeCol`).
    */
  def keepers(media: DataFrame,
      eventTimeCol: String = "ingested_at",
      watermarkDelay: String = "1 day",
      stateHorizonHours: Int = 24): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = media.sparkSession
    import spark.implicits._
    val horizonMs = stateHorizonHours.toLong * 3600 * 1000
    val observed = media
      .select(col("media_id").cast("long"), col("payload"),
        col(eventTimeCol).as("ingested_at"))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { r =>
          val payload = r.getAs[Array[Byte]](1)
          val img =
            try {
              if (payload == null || payload.isEmpty) null
              else javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(payload))
            } catch { case _: java.io.IOException | _: RuntimeException => null }
          val hash =
            if (img == null) None
            else {
              val w = img.getWidth; val h = img.getHeight
              val rgb = img.getRGB(0, 0, w, h, null, 0, w)
              md.reset()
              val buf = new Array[Byte](rgb.length * 3)
              var i = 0
              while (i < rgb.length) {
                val p = rgb(i)
                buf(i * 3) = ((p >> 16) & 0xFF).toByte
                buf(i * 3 + 1) = ((p >> 8) & 0xFF).toByte
                buf(i * 3 + 2) = (p & 0xFF).toByte
                i += 1
              }
              Some(md.digest(buf).map("%02x".format(_)).mkString)
            }
          PixelObs(r.getLong(0), r.getTimestamp(2), hash)
        }
      }
      .withWatermark("ingested_at", watermarkDelay)
    observed
      .groupByKey(o => o.pixel_md5 match {
        case Some(h) => (false, h)
        case None => (true, o.media_id.toString) // unique key: no claim
      })
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: (Boolean, String), rows: Iterator[PixelObs], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val rs = rows.toSeq
            if (key._1)
              rs.iterator.map(r => PixelVerdict(r.media_id, r.ingested_at,
                keeper = true, quarantined = true))
            else {
              val winner =
                if (state.exists) None
                else Some(rs.minBy(r =>
                  (r.ingested_at.getTime, r.media_id)).media_id)
              state.update(true)
              state.setTimeoutTimestamp(
                rs.map(_.ingested_at.getTime).max + horizonMs)
              rs.iterator.map(r => PixelVerdict(r.media_id, r.ingested_at,
                keeper = winner.contains(r.media_id), quarantined = false))
            }
          })
      .toDF()
  }
}
