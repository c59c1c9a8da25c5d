package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.llmdata.{Dedup, Similarity}

/** INCREMENTAL ANN-INDEX MAINTENANCE (r12 verdict task 3 — the
  * dd12-for-vectors): admitted embeddings upsert into a PERSISTED ANN
  * index instead of rebuild-per-snapshot. The index artifact set extends
  * the ss7/ss17 `write_index` posture:
  *
  *   /exemplars  (cell, cv)            — the trained IVF codebook
  *   /vectors    (vec_id, v)           — the indexed vector store
  *   /cells      (vec_id, cell)        — scan-side IVF assignment
  *   /graph      (src_id, out_rank, neighbor_id, cos_sim, diversified)
  *                                     — the ss18 diversified serving graph
  *
  * An insert batch follows the HNSW insert shape: each new vector is
  * ASSIGNED to its cell scan-side with the stored codebook (training is
  * stable — the documented staleness contract), then SEARCHED against
  * the existing graph (an insert IS a serve-search for the insertion
  * neighborhood), its top-R results become its out-edges, and each found
  * neighbor's adjacency list is re-trimmed to top-R by similarity with
  * the new back-edge as a candidate. Inserted edges carry
  * `diversified = false` — they are similarity-trimmed, not
  * occlusion-rule-checked; a periodic rebuild ([[writeAnnIndex]], i.e.
  * the ss16+ss18 build) restores rule-pruned edge sets, exactly how
  * production graph indexes amortize insert cost against rebuild
  * quality.
  *
  * IDEMPOTENT (the CurationIngest restart contract): a replayed batch
  * whose vec_ids are all present in the vector store is skipped — the
  * vector store is written LAST, so it is the batch's commit marker
  * (all-ids-present ⇒ every artifact landed; spec asserts byte-equal
  * artifacts under replay). A PARTIALLY applied batch (crash before the
  * vectors write) re-runs against reconstructed prior state: the
  * batch's own ids are anti-joined out of the stored graph/cells first,
  * so re-application is deterministic and every invariant (contiguous
  * out_ranks, bounded degree) holds — though a touched neighbor's list
  * can differ from the never-crashed outcome where a first-pass trim
  * already dropped an old edge (the trim is lossy; exactly the residual
  * a transactional MERGE target closes). Batch vectors never score each
  * other: ordering within a batch cannot matter.
  *
  * Scale posture: assignment and encoding are scan-side over the batch;
  * the search touches the stored graph only through vec_id key joins
  * (bounded frontier per new vector); the only full-artifact passes are
  * the anti-join + union rewrites, which on a transactional table become
  * keyed MERGE INTO / DELETE+INSERT — the parquet overwrite here is the
  * offline stand-in, same as CdcMaterialize's ledgers.
  */
object AnnIngest {

  /** Full index build from a fixture dir — the rebuild path an
    * incremental deployment runs periodically. */
  def writeAnnIndex(spark: SparkSession, dir: String, out: String): Unit = {
    Similarity.writeKnnGraphIndex(spark, dir, out) // /graph (ss16+ss18 build)
    val ex = Similarity.exemplarsOf(spark, dir)
    ex.write.mode("overwrite").parquet(s"$out/exemplars")
    val vecs = graft.sources.Tables.load(spark, dir, "embeddings")
      .filter(col("vec_id") >= Similarity.NumQueries)
      .select(col("vec_id"), Dedup.vecD(col("embedding")).as("v"))
    vecs.write.mode("overwrite").parquet(s"$out/vectors")
    Similarity.assignCellsWith(vecs, "v", ex)
      .select(col("vec_id"), col("cell"))
      .write.mode("overwrite").parquet(s"$out/cells")
  }

  /** Upsert one batch of (vec_id, embedding) rows into the persisted
    * index at `indexDir`. Safe to call from `foreachBatch`; replaying
    * the same batch is a no-op (byte-identical artifacts). */
  def upsertVectors(spark: SparkSession, indexDir: String,
                    batch: DataFrame): Unit = {
    val newV = batch
      .select(col("vec_id"), Dedup.vecD(col("embedding")).as("v"))
      .localCheckpoint()
    val newIds = newV.select(col("vec_id"))
    // applied-batch detection: vectors is written last (the commit
    // marker) — if no batch id is missing there, the batch fully landed
    val unapplied = newIds.join(
      spark.read.parquet(s"$indexDir/vectors").select(col("vec_id")),
      Seq("vec_id"), "left_anti")
    if (unapplied.isEmpty) return

    // prior state EXCLUDING the batch ids — partial-replay determinism
    val vectors = spark.read.parquet(s"$indexDir/vectors")
      .join(newIds, Seq("vec_id"), "left_anti").localCheckpoint()
    val cells = spark.read.parquet(s"$indexDir/cells")
      .join(newIds, Seq("vec_id"), "left_anti").localCheckpoint()
    val graph0 = spark.read.parquet(s"$indexDir/graph")
    val graph = graph0
      .join(newIds.withColumnRenamed("vec_id", "src_id"), Seq("src_id"), "left_anti")
      .join(newIds.withColumnRenamed("vec_id", "neighbor_id"),
        Seq("neighbor_id"), "left_anti")
      .localCheckpoint()
    val ex = spark.read.parquet(s"$indexDir/exemplars")
    val nPrior = vectors.count()
    // the stored graph's own out-degree is the trim bound (max out_rank —
    // one scalar, deterministic from the artifact); a degenerate empty
    // prior graph (tiny index fully covered by the batch) falls back to
    // the build formula instead of NPE-ing the stream
    val rRow = graph.agg(max(col("out_rank"))).collect()(0)
    val r =
      if (rRow.isNullAt(0))
        Similarity.pruneDegreeOf(Similarity.degreeOf(math.max(nPrior, 2L)))
      else rRow.getLong(0).toInt

    // 1) HNSW insert = serve-search: new vectors as queries against the
    //    prior graph/vector store; entries restricted to exemplar cells
    //    that are still prior nodes (a batch could contain an exemplar id)
    val undP = Similarity.undirected(
      graph.select(col("src_id"), col("neighbor_id"))).localCheckpoint()
    val exPrior = ex.join(vectors.select(col("vec_id").as("cell")), "cell")
    val q = newV.select(col("vec_id").as("query_id"), col("v").as("q"))
    val visited = Similarity.serveVisitedByHopFrames(
      vectors, q, exPrior, undP,
      beam = 8, entries = 3, hops = Similarity.serveHopsOf(nPrior)).last
    val found = visited.groupBy(col("query_id"))
      .agg(graft.functions.TopKByScore.topK(
        col("score"), col("node_id"), r).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("query_id").as("src_id"),
        (col("pos") + 1).cast(LongType).as("out_rank"),
        col("e.id").as("neighbor_id"), col("e.score").as("cos_sim"),
        lit(false).as("diversified"))
      .localCheckpoint()

    // 2) back-edges: every found neighbor re-trims its list to top-r by
    //    similarity with the new vectors as candidates
    val backCand = found
      .select(col("neighbor_id").as("src_id"), col("src_id").as("neighbor_id"),
        col("cos_sim"), lit(false).as("diversified"))
    val touchedIds = backCand.select(col("src_id")).distinct()
    val touchedOld = graph.join(touchedIds, Seq("src_id"), "left_semi")
      .select(col("src_id"), col("neighbor_id"), col("cos_sim"),
        col("diversified"))
    val w = Window.partitionBy(col("src_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    val touchedNew = touchedOld.union(backCand)
      .withColumn("out_rank", row_number().over(w).cast(LongType))
      .filter(col("out_rank") <= r)
      .select(col("src_id"), col("out_rank"), col("neighbor_id"),
        col("cos_sim"), col("diversified"))
    // untouched nodes re-rank by their existing order: identical values
    // when already contiguous (the clean path), and a partial-apply
    // REPLAY — where a first pass's back-edge was anti-joined away and
    // left a rank gap — closes back to contiguous ranks (the docstring's
    // invariant) instead of persisting the gap
    val wu = Window.partitionBy(col("src_id")).orderBy(col("out_rank"))
    val untouched = graph.join(touchedIds, Seq("src_id"), "left_anti")
      .withColumn("out_rank", row_number().over(wu).cast(LongType))
    val mergedGraph = untouched.select(found.columns.map(col).toIndexedSeq: _*)
      .union(touchedNew).union(found)
      .orderBy(col("src_id"), col("out_rank")).localCheckpoint()

    // 3) cells/vectors upserts with the stored codebook
    val newCells = Similarity.assignCellsWith(newV, "v", ex)
      .select(col("vec_id"), col("cell"))
    val mergedCells = cells.union(newCells).orderBy(col("vec_id"))
      .localCheckpoint()
    val mergedVectors = vectors.union(newV).orderBy(col("vec_id"))
      .localCheckpoint()

    // localCheckpoints above pin every output BEFORE any overwrite: the
    // merged frames' lineage reads the same parquet paths being replaced
    mergedGraph.write.mode("overwrite").parquet(s"$indexDir/graph")
    mergedCells.write.mode("overwrite").parquet(s"$indexDir/cells")
    mergedVectors.write.mode("overwrite").parquet(s"$indexDir/vectors")
  }

  /** `foreachBatch` adapter: wire as
    * `.writeStream.foreachBatch(AnnIngest.foreachBatchUpsert(indexDir) _)`
    * on a (vec_id, embedding) stream. */
  def foreachBatchUpsert(indexDir: String)
                        (batch: DataFrame, batchId: Long): Unit =
    if (!batch.isEmpty) upsertVectors(batch.sparkSession, indexDir, batch)
}
