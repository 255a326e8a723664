package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.multimodal.{AudioIntegrity, MediaDedup}

/** Live media-integrity gating — the streaming counterpart of the
  * batch audits q154 (image/caption alignment) and q156 (audio dead
  * air): every arriving media row is verified against its own payload
  * bytes at ingest, before a corrupted batch ever lands in silver.
  * Same role QualityGate plays for text, same design rules:
  *
  *  - **Batch and stream share the row kernel.**
  *    [[MediaDedup.alignmentDistance]] / [[AudioIntegrity.loudestBin]]'s
  *    decode path score the row here and in the batch audits, so the
  *    two faces can never disagree on a row (MediaGateSpec pins batch
  *    parity on mixed healthy/corrupt/undecodable input).
  *  - **Stateless, shuffle-free.** The gate is a per-partition map +
  *    filter: no state store, no watermark, no aggregation — it
  *    composes with any downstream streaming query, and throughput is
  *    the ingest scan's throughput at any executor count. The decoders
  *    initialize per PARTITION, not per row.
  *
  * Input schema: (doc_id, media_type 'image'|'audio', text, content).
  * Output adds `integrity_dist` (the modality's distance-from-healthy:
  * alignment L2 for images, envelope gap above silence negated for
  * audio — both flag HIGH) and `keep`. Unknown media types and
  * undecodable payloads are quarantined, never passed: an unverifiable
  * row is not a healthy row.
  */
object MediaGate {

  /** Image rows fail above this alignment distance (q154's threshold —
    * intact pairs sit at 0.0, the corrupt plants at ≥ 4). */
  val AlignThreshold = 1.0

  /** Audio rows fail when the loudest envelope bin is below this
    * (q156's threshold — silence decodes to −1, real clips ≥ −0.5).
    * Expressed as a distance (−max_env) so both modalities flag HIGH. */
  val SilenceDistance = -AudioIntegrity.SilenceThreshold

  /** Gate a (streaming or batch) media relation: adds `integrity_dist`
    * and `keep`; `keep = false` rows are the quarantine stream. */
  def gate(rows: DataFrame): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.select(col("doc_id").cast("long"), col("media_type"),
        col("text"), col("content"))
      .as[(Long, String, String, Array[Byte])]
      .mapPartitions(_.map { case (id, mediaType, text, content) =>
        val (dist, keep) = mediaType match {
          case "image" =>
            val d = MediaDedup.alignmentDistance(text, content)
            (d, d <= AlignThreshold)
          case "audio" =>
            val maxEnv = AudioIntegrity.maxEnv(content)
            (-maxEnv, -maxEnv <= SilenceDistance)
          case _ => (Double.MaxValue, false)
        }
        (id, mediaType, text, content, dist, keep)
      })
      .toDF("doc_id", "media_type", "text", "content", "integrity_dist", "keep")
  }
}
