package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.TextExprs

/** Streaming MinHash+LSH near-duplicate detection — the incremental
  * variant of the batch q18/q40 pipeline: documents arrive on a stream,
  * and each one is checked against everything already ingested WITHOUT
  * re-scanning the corpus. This is how a training-data pipeline keeps a
  * growing corpus deduped: the batch operators dedup a snapshot; this
  * operator guards the door afterwards.
  *
  * Design, Spark-first:
  *  - The MinHash signature is computed as PURE per-row array
  *    expressions (no explode + groupBy like the batch path): streaming
  *    aggregation state would otherwise grow with shingles in flight,
  *    and a per-row projection needs none. Same Kirsch–Mitzenmacher
  *    double hashing as batch (`(h1 + i·h2) mod p`), xxhash64 base
  *    hashes (the q40 production path — no oracle constraint here).
  *  - Each document explodes into its LSH band keys; the stream groups
  *    by (band, key) and `flatMapGroupsWithState` keeps the bucket's
  *    member list (doc_id + signature) as state. A new arrival emits a
  *    candidate pair for every same-bucket member whose
  *    SIGNATURE-estimated Jaccard (matching minima / 20) clears the
  *    threshold — exactly the LSH contract, evaluated incrementally.
  *  - State is bounded per bucket by [[MaxBucketMembers]]: a banded key
  *    shared by more members than that has degenerated into a
  *    boilerplate bucket (the streaming analog of the batch
  *    document-frequency cap) and stops absorbing members; overflow is
  *    observable via the emitted `bucket_full` flag, not silent.
  *
  * Scale shape: state shuffles by band key (uniform — minhash values),
  * one small record per (bucket, member); the per-arrival work is
  * |bucket| signature comparisons, never corpus-sized. Run it with the
  * RocksDB state store provider (see StreamingNearDupSpec) so state
  * lives off-heap and spills — the configuration a 100 TB deployment
  * uses for million-bucket state.
  */
object StreamingNearDup {

  val MinhashSeeds = 20
  val BandRows = 2 // 10 bands × 2 rows
  val ShingleN = 3
  val MaxBucketMembers = 64
  /** Rejected-arrival ids remembered per full bucket (newest first), so
    * an at-least-once redelivery of an overflow doc does not re-emit its
    * candidate pairs — admitted docs get that idempotency from the
    * member list for free; without this, every replay of a hot-bucket
    * doc duplicates up to [[MaxBucketMembers]] rows in the append-mode
    * output. Bounded: a redelivery arriving after `cap` newer rejects
    * (restart replay windows are far shorter) re-emits once. */
  val MaxRejectedTracked = 1024
  val DefaultMinEstJaccard = 0.5

  private val KmPrime = 1125899906842597L

  case class BandedDoc(band: Int, bk: String, doc_id: Long, sig: Seq[Long])
  case class BucketState(
      members: List[(Long, Seq[Long])], full: Boolean, rejected: List[Long] = Nil)
  case class Candidate(d1: Long, d2: Long, band: Int, est_jaccard: Double, bucket_full: Boolean)

  /** The 20-minimum MinHash signature as one per-row expression. The
    * (h1, h2) base-hash arrays bind to a lambda variable (the
    * [[TextExprs.shingles]] trick): referenced directly, project
    * collapsing would inline and re-hash every shingle once per seed —
    * 20× the hashing cost. */
  def signature(text: Column): Column =
    signatureFromTokens(TextExprs.tokens(text))

  /** Signature over a pre-tokenized column — [[banded]] projects tokens
    * ONCE and feeds both the length gate and the signature, instead of
    * re-splitting the full document for each. */
  def signatureFromTokens(toks: Column): Column = {
    val sh = TextExprs.shingles(toks, ShingleN)
    val hs = struct(
      transform(sh, s => pmod(xxhash64(s), lit(KmPrime))).as("h1"),
      transform(sh, s => pmod(xxhash64(s, lit(1L)), lit(KmPrime))).as("h2"))
    flatten(transform(array(hs), t =>
      transform(sequence(lit(0), lit(MinhashSeeds - 1)), i =>
        array_min(zip_with(t.getField("h1"), t.getField("h2"),
          (a, b) => pmod(a + i * b, lit(KmPrime)))))))
  }

  /** docs(doc_id, text) → one row per (band, band_key) with the full
    * signature along for the ride. Narrow except the explode; documents
    * with fewer than [[ShingleN]] tokens carry no shingles and are
    * dropped (they cannot near-dup by shingle overlap). */
  def banded(docs: DataFrame): Dataset[BandedDoc] = {
    import docs.sparkSession.implicits._
    val bandStructs = (0 until MinhashSeeds / BandRows).map { b =>
      struct(lit(b).as("band"),
        concat_ws("|",
          (0 until BandRows).map(r => element_at(col("sig"), b * BandRows + r + 1)): _*).as("bk"))
    }
    docs
      .select(col("doc_id").cast("long").as("doc_id"),
        TextExprs.tokens(col("text")).as("toks"))
      .where(size(col("toks")) >= ShingleN)
      .select(col("doc_id"), signatureFromTokens(col("toks")).as("sig"))
      .select(col("doc_id"), col("sig"), explode(array(bandStructs: _*)).as("x"))
      .select(col("x.band").as("band"), col("x.bk").as("bk"), col("doc_id"), col("sig"))
      .as[BandedDoc]
  }

  /** The stateful core: per-bucket member lists, candidate pairs out.
    * Arrivals process in doc_id order within a batch for determinism. */
  def candidates(
      docs: DataFrame,
      minEstJaccard: Double = DefaultMinEstJaccard): Dataset[Candidate] = {
    import docs.sparkSession.implicits._
    banded(docs)
      .groupByKey(d => (d.band, d.bk))
      .flatMapGroupsWithState[BucketState, Candidate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((band, _), batch: Iterator[BandedDoc], state: GroupState[BucketState]) =>
          var st = state.getOption.getOrElse(BucketState(Nil, full = false))
          val out = Seq.newBuilder[Candidate]
          batch.toSeq.sortBy(_.doc_id).foreach { d =>
            if (!st.members.exists(_._1 == d.doc_id) && !st.rejected.contains(d.doc_id)) {
              // saturation is decided BEFORE this arrival is admitted, so
              // its own candidates already carry the flag
              val full = st.members.sizeIs >= MaxBucketMembers
              st.members.foreach { case (mid, msig) =>
                val matches = msig.iterator.zip(d.sig.iterator).count { case (a, b) => a == b }
                val est = matches.toDouble / MinhashSeeds
                if (est >= minEstJaccard)
                  out += Candidate(math.min(mid, d.doc_id), math.max(mid, d.doc_id),
                    band, est, full)
              }
              st = if (full) st.copy(full = true,
                     rejected = (d.doc_id :: st.rejected).take(MaxRejectedTracked))
                   else st.copy(members = (d.doc_id, d.sig) :: st.members)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }
}
