package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.LongType

/** Input to the stateful packer: one document with its real BPE token
  * count (the encode runs scan-side, before the state op). */
case class PackDoc(source: String, doc_id: Long, n_bpe: Long)

/** One document's placement in the packed token stream — the streaming
  * twin of tx26's per-doc row (offsets/bins identical by construction
  * under in-order arrival), plus the `arrived_late` audit flag (see
  * [[PackingIngest]]'s out-of-order contract). */
case class PackPlacement(source: String, doc_id: Long, n_bpe: Long,
                         tok_offset: Long, start_bin: Long, end_bin: Long,
                         crosses_boundary: Boolean, arrived_late: Boolean)

/** Per-source packer state: the next free token offset and the highest
  * doc_id placed so far (the order sentinel). Two longs per source —
  * still the smallest possible stateful footprint. */
case class PackState(offset: Long, maxDocId: Long)

/** STREAMING sequence packing — tx26's placement algebra run as an
  * incremental ingest: documents arrive on a stream (CDC bus, crawl
  * frontier), each is BPE-encoded scan-side ([[graft.functions.BpeEncode]]
  * — the merge table rides in the task binary, streaming or not), and a
  * per-source running token offset carried in keyed state places every
  * document into the same [[graft.llmdata.Constants.PackBudget]]-token
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
  * OUT-OF-ORDER ARRIVAL (r15): a crawl frontier does NOT guarantee
  * doc_id order, and the two candidate responses differ in what they
  * protect. A watermarked reorder buffer would protect BATCH-PARITY at
  * the price of unbounded-or-lossy state (buffer until the watermark,
  * then silently DROP late documents — data loss inside a packer).
  * This packer instead makes the chosen semantics explicit: ARRIVAL
  * ORDER IS THE PACK ORDER — placements stay contiguous and
  * token-exact in arrival order (never corrupted: every token lands in
  * exactly one bin, offsets never collide, totals equal batch) — and
  * any document that arrives after a HIGHER doc_id of its source was
  * already placed is flagged `arrived_late = true`. The flag is the
  * detectability guarantee: zero flags ⇒ the batch-parity contract held
  * and the output is bit-identical to tx26; any flag ⇒ this source's
  * layout diverged from the batch layout at that point, visibly, for
  * the consumer to route (re-pack the source at the next rebuild, or
  * accept stream order as canonical — the normal choice, since bin
  * CONTENT order within a training shard is immaterial after cur14's
  * epoch shuffle). State grows by one long (the order sentinel), not by
  * a buffer: the 100 TB posture is unchanged.
  *
  * Scale posture: state is TWO Longs per source (not per doc); each
  * trigger shuffles only its own micro-batch to the source groups; the
  * per-group sort is bounded by the micro-batch, never the corpus. At
  * 100 TB of history the state is still 2·|sources| longs.
  */
object PackingIngest {

  private val Budget: Long = graft.llmdata.Constants.PackBudget.toLong

  /** Scan-side BPE count — identical expression to tx26's. */
  private def countTokens(docs: DataFrame): DataFrame =
    docs.filter(col("text").isNotNull)
      .select(col("source"), col("doc_id"),
        size(org.apache.spark.sql.GraftColumn.of(
          graft.functions.BpeEncode(
            org.apache.spark.sql.GraftColumn.expr(col("text")))))
          .cast(LongType).as("n_bpe"))

  /** INCREMENTAL shard-segment sink: the streaming closure of the full
    * tokenize → pack → shard pipeline. Each micro-batch of placements is
    * exploded into the same per-bin document segments
    * [[graft.llmdata.Curation.writeShardFiles]] emits — the shard is the
    * identical seeded (source, bin) hash, recomputed (never joined) — and
    * written with the exactlyOnceBatchWrite idiom: `partitionBy(shard,
    * batch_id)` + dynamic partition overwrite, so a replayed batch
    * rewrites exactly its own partitions with the identical rows (the
    * packer's placements are state-replay-deterministic). Segments are
    * append-only — a bin spanning micro-batches accumulates its segments
    * across batch partitions without conflict — so the reader is a plain
    * union (no latest-view window needed, unlike AnnIngest's upserts).
    * Wire as `packStream(docs).writeStream
    *   .foreachBatch(PackingIngest.foreachBatchShardSegments(out) _)`.
    * StreamingOpsSpec asserts the read-back is content-identical to the
    * batch writer's files across arbitrary chops, and that a replayed
    * batch changes nothing. */
  def foreachBatchShardSegments(out: String)
                               (batch: Dataset[PackPlacement],
                                batchId: Long): Unit = {
    if (batch.isEmpty) return
    val budget = lit(Budget)
    batch.toDF()
      .select(col("source"), col("doc_id"), col("tok_offset"), col("n_bpe"),
        explode(sequence(col("start_bin"), col("end_bin"))).as("bin"))
      .select(col("source"), col("bin"), col("doc_id"),
        greatest(col("tok_offset") - col("bin") * budget, lit(0L))
          .as("pos_in_bin"),
        greatest(col("bin") * budget - col("tok_offset"), lit(0L))
          .as("seg_from"),
        (least((col("bin") + 1L) * budget, col("tok_offset") + col("n_bpe"))
          - greatest(col("bin") * budget, col("tok_offset"))).as("seg_len"))
      .withColumn("shard",
        graft.llmdata.Curation.shardOf(graft.llmdata.Curation.epochHash(0)))
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("shard", "batch_id")
      .parquet(out)
  }

  /** The stateful packer: keyed by source, state = (next free token
    * offset, highest doc_id placed). Docs inside one trigger are placed
    * in doc_id order (the iterator order within a group is not
    * guaranteed; the sort is micro-batch-bounded), so disorder can only
    * enter BETWEEN triggers — exactly what the sentinel detects. */
  def packStream(docs: DataFrame): Dataset[PackPlacement] = {
    import docs.sparkSession.implicits._
    countTokens(docs).as[PackDoc]
      .groupByKey(_.source)
      .flatMapGroupsWithState[PackState, PackPlacement](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (source, it, state) =>
          var st = state.getOption.getOrElse(PackState(0L, Long.MinValue))
          val placed = it.toVector.sortBy(_.doc_id).map { d =>
            val start = st.offset / Budget
            val end = (st.offset + math.max(d.n_bpe, 1L) - 1L) / Budget
            val p = PackPlacement(source, d.doc_id, d.n_bpe, st.offset,
              start, end, end > start, arrived_late = d.doc_id < st.maxDocId)
            st = PackState(st.offset + d.n_bpe, math.max(st.maxDocId, d.doc_id))
            p
          }
          state.update(st)
          placed.iterator
      }
  }
}
