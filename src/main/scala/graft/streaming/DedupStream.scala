package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental (streaming) near-duplicate detection: the online form
  * of Dedup's MinHash+LSH banding. Documents arrive as a stream; each
  * band row keys into a `flatMapGroupsWithState` group holding the
  * signatures seen in that bucket so far, and every arrival is
  * compared against ONLY its bucket-mates — the state per key stays
  * proportional to bucket size, never to the corpus.
  *
  * This is how dedup runs in a continuously-ingesting 100 TB
  * pipeline: the batch self-join is replaced by per-bucket state, and
  * a document is flagged the moment a near-dup lands, not at the next
  * batch rebuild. Banding is byte-identical to the batch path
  * (Dedup.bandsOf), so the candidate set provably matches — asserted
  * in DedupStreamSpec. Signature math is murmur3-seeded → rows-only
  * for the driver oracle.
  */

/** A band row entering the keyed state. */
case class BandRow(band_idx: Int, band_sig: String, doc_id: Long,
    sig: Seq[Long])

/** An emitted near-dup candidate (a_id < b_id). */
case class DupCand(a_id: Long, b_id: Long, est_jaccard: Double)

object DedupStream {

  private val EstThreshold = 0.5

  /** Streaming documents relation for an sf dir. */
  private def documentsStream(s: SparkSession, dir: String): DataFrame = {
    val schema = graft.util.Tables.documents(s, dir).schema
    graft.util.Tables.streamTable(s, dir, "documents", schema)
  }

  /** Near-dup candidate pairs with estimated Jaccard ≥ 0.5, found
    * incrementally. Pairs colliding in several bands dedup at the end
    * (same as the batch path's distinct()).
    */
  def streamingDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sigs = graft.ops.Dedup.minhashSignatures(
      documentsStream(s, dir).select(col("doc_id"), col("text")))
    val bands = graft.ops.Dedup.bandsOf(sigs).as[BandRow]

    val pairs = bands.groupByKey(r => (r.band_idx, r.band_sig))
      .flatMapGroupsWithState[List[(Long, Seq[Long])], DupCand](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_, rows: Iterator[BandRow],
            state: GroupState[List[(Long, Seq[Long])]]) =>
          var seen = state.getOption.getOrElse(Nil)
          val out = List.newBuilder[DupCand]
          // iterator order within a batch is partition-dependent —
          // sort so the emitted pair set is deterministic
          for (r <- rows.toSeq.sortBy(_.doc_id)) {
            for ((otherId, otherSig) <- seen if otherId != r.doc_id) {
              val eq = r.sig.iterator.zip(otherSig.iterator)
                .count { case (x, y) => x == y }
              val est = eq.toDouble / graft.ops.Dedup.NumHashes
              if (est >= EstThreshold)
                out += DupCand(math.min(r.doc_id, otherId),
                  math.max(r.doc_id, otherId),
                  math.rint(est * 10000) / 10000)
            }
            seen = (r.doc_id, r.sig) :: seen
          }
          state.update(seen)
          out.result().iterator
      }

    EventStream.runToCompletion(s, pairs.toDF(), OutputMode.Append())
      .distinct()
      .orderBy("a_id", "b_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_dedup_minhash" -> (streamingDedup _),
  )

  /** murmur3-seeded signatures are not DuckDB-replayable → rows-only;
    * batch equivalence is asserted in DedupStreamSpec.
    */
  val oracle: Map[String, String] = Map.empty
}
