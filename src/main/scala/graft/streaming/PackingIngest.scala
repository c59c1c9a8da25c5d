package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.LongType

/** Input to the stateful packer: one document with its real BPE token
  * count (the encode runs scan-side, before the state op). */
case class PackDoc(source: String, doc_id: Long, n_bpe: Long)

/** One document's placement in the packed token stream — the streaming
  * twin of tx26's per-doc row (offsets/bins identical by construction). */
case class PackPlacement(source: String, doc_id: Long, n_bpe: Long,
                         tok_offset: Long, start_bin: Long, end_bin: Long,
                         crosses_boundary: Boolean)

/** STREAMING sequence packing — tx26's placement algebra run as an
  * incremental ingest: documents arrive on a stream (CDC bus, crawl
  * frontier), each is BPE-encoded scan-side ([[graft.functions.BpeEncode]]
  * — the merge table rides in the task binary, streaming or not), and a
  * per-source running token offset carried in keyed state places every
  * document into the same [[graft.llmdata.TextAnalysis.PackBudget]]-token
  * bins the batch packer would have chosen. A training-data pipeline runs
  * exactly this shape when the corpus is append-only: pack ON ARRIVAL,
  * never re-pack the history.
  *
  * Semantics contract (spec-pinned): if documents arrive in doc_id order
  * per source — the CDC replay guarantee — the streaming placements are
  * ROW-IDENTICAL to batch tx26 over the union of all micro-batches, no
  * matter how the stream is chopped, including across a kill + restart
  * (the offset lives in the checkpointed state store, exactly-once).
  *
  * Scale posture: state is ONE Long per source (not per doc — the
  * smallest possible stateful footprint); each trigger shuffles only its
  * own micro-batch to the source groups; the per-group sort is bounded by
  * the micro-batch, never the corpus. At 100 TB of history the state is
  * still |sources| longs.
  */
object PackingIngest {

  private val Budget: Long = graft.llmdata.TextAnalysis.PackBudget.toLong

  /** Scan-side BPE count — identical expression to tx26's. */
  private def countTokens(docs: DataFrame): DataFrame =
    docs.filter(col("text").isNotNull)
      .select(col("source"), col("doc_id"),
        size(org.apache.spark.sql.GraftColumn.of(
          graft.functions.BpeEncode(
            org.apache.spark.sql.GraftColumn.expr(col("text")))))
          .cast(LongType).as("n_bpe"))

  /** The stateful packer: keyed by source, state = the next free token
    * offset. Docs inside one trigger are placed in doc_id order (the
    * iterator order within a group is not guaranteed; the sort is
    * micro-batch-bounded). */
  def packStream(docs: DataFrame): Dataset[PackPlacement] = {
    import docs.sparkSession.implicits._
    countTokens(docs).as[PackDoc]
      .groupByKey(_.source)
      .flatMapGroupsWithState[Long, PackPlacement](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (source, it, state) =>
          var off = state.getOption.getOrElse(0L)
          val placed = it.toVector.sortBy(_.doc_id).map { d =>
            val start = off / Budget
            val end = (off + math.max(d.n_bpe, 1L) - 1L) / Budget
            val p = PackPlacement(source, d.doc_id, d.n_bpe, off,
              start, end, end > start)
            off += d.n_bpe
            p
          }
          state.update(off)
          placed.iterator
      }
  }
}
