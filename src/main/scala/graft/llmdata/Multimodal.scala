package graft.llmdata

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Multimodal-column plumbing: opaque `binary` payloads with typed metadata,
  * plus partition-batched decode / feature-extract / resize / frame-sample
  * operators. LLM-data north star module (SURVEY.md §7.1 step 7).
  *
  * The container has no image/audio codecs, so the DECODE step itself is a
  * deterministic stand-in ([[StubCodec]]) — clearly marked; everything
  * around it (binary column carriage, schema, partition-batched execution,
  * feature schema) is the real Spark plumbing a codec would plug into.
  *
  * Scale posture (100 TB): media bytes never pass through a shuffle — all
  * operators are per-partition maps; metadata-only queries project the
  * binary column away so the parquet scan prunes it (check ReadSchema).
  */
object Multimodal {

  /** One media object: opaque bytes + typed metadata. */
  final case class MediaRecord(
      media_id: Long,
      kind: String, // image | audio | video
      content: Array[Byte])

  /** Extracted features (what a real codec would emit). */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      width: Int, // fake dims derived from content, deterministic
      height: Int,
      n_frames: Int,
      mean_byte: Double)

  /** STUB CODEC — deterministic stand-in for image/audio decode. A real
    * deployment swaps `decode` for e.g. javax.imageio / ffmpeg bindings;
    * the call shape (bytes → features, executed inside mapPartitions with
    * per-partition reuse of the "decoder") is the part under test. */
  object StubCodec {
    def decode(r: MediaRecord): MediaFeatures = {
      val n = r.content.length
      val w = 16 + (if (n == 0) 0 else java.lang.Byte.toUnsignedInt(r.content(0)) % 64)
      val h = 16 + (if (n < 2) 0 else java.lang.Byte.toUnsignedInt(r.content(1)) % 64)
      val frames = if (r.kind == "video") 1 + n / 64 else 1
      var s = 0L
      var i = 0
      while (i < n) { s += java.lang.Byte.toUnsignedInt(r.content(i)); i += 1 }
      MediaFeatures(r.media_id, r.kind, n.toLong, w, h, frames,
        if (n == 0) 0.0 else s.toDouble / n)
    }

    private val HexDigits = "0123456789abcdef"

    /** Decoded-domain SIGNAL (the stub "pixel plane"): one hex char per
      * byte — the byte's HIGH nibble. The low nibble models the
      * encoding-dependent bits lossy compression is free to perturb;
      * [[reencode]] rewrites exactly those, so `decodeSignal(reencode(r))
      * == decodeSignal(r)` by construction — the stub analogue of "same
      * pixels, different file bytes". */
    def decodeSignal(r: MediaRecord): String =
      r.content.map(b => HexDigits((b >> 4) & 0xF)).mkString

    /** Stub RE-ENCODE: keep every byte's high nibble (the signal), replace
      * the low nibble with a deterministic function of the high one
      * ((hi + 7) mod 16) — almost every byte of the payload changes, but
      * the decoded signal is untouched. */
    def reencode(r: MediaRecord): MediaRecord = {
      val out = r.content.map { b =>
        val hi = (b >> 4) & 0xF
        ((hi << 4) | ((hi + 7) % 16)).toByte
      }
      r.copy(content = out)
    }
  }

  /** Synthesize a media table from the documents fixture: text bytes stand
    * in for encoded media; kind cycles by id. (No media fixtures ship with
    * the testdata — the binary-column plumbing is what matters.) */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents").select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast(IntegerType)).as("kind"),
      col("text").cast(BinaryType).as("content"))

  /** Partition-batched decode: the canonical pattern for codec UDFs — one
    * `mapPartitions` so any expensive decoder state is initialized once per
    * partition, not per row. */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init would go here (e.g. native codec handle)
      it.map(StubCodec.decode)
    }
  }

  /** "Resize": truncate-or-keep the payload to `maxBytes` — the byte-level
    * analogue of image downscale, as a pure column op (no JVM round-trip). */
  def resize(media: DataFrame, maxBytes: Int): DataFrame =
    media.withColumn("content",
      when(octet_length(col("content")) > maxBytes,
        substring(col("content"), 1, maxBytes)).otherwise(col("content")))

  /** Frame sampling: every `stride`-th byte as a one-byte "frame" — the
    * plumbing shape of video frame extraction (array out of binary). */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media.withColumn("frames",
      transform(
        sequence(lit(1), greatest(floor(octet_length(col("content")) / stride), lit(1))
          .cast(IntegerType)),
        i => col("content").substr((i - 1) * stride + 1, lit(1))))

  // ------------------------------------------------------- oracle queries

  /** Metadata-only scan over the media table: byte sizes and header bytes
    * per kind. The binary payload feeds octet_length/header only — at scale
    * with real parquet media columns, the scan prunes everything else. */
  def binaryMeta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(col("kind"),
        octet_length(col("content")).cast(LongType).as("n_bytes"),
        lower(hex(substring(col("content"), 1, 4))).as("header"))
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        min(col("n_bytes")).as("min_bytes"),
        max(col("n_bytes")).as("max_bytes"),
        countDistinct(col("header")).as("n_headers"))
      .orderBy(col("kind"))

  val binaryMetaSql: String =
    """WITH m AS (SELECT doc_id AS media_id,
      |    ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
      |    encode(text) AS content,
      |    lower(substr(hex(encode(text)), 1, 8)) AS header
      |  FROM documents)
      |SELECT kind, COUNT(*) AS n_media,
      |  CAST(SUM(octet_length(content)) AS BIGINT) AS total_bytes,
      |  MIN(octet_length(content)) AS min_bytes,
      |  MAX(octet_length(content)) AS max_bytes,
      |  COUNT(DISTINCT header) AS n_headers
      |FROM m GROUP BY kind ORDER BY kind""".stripMargin

  /** Decode + aggregate via the partition-batched stub codec. The decode
    * step runs in mapPartitions (the codec-state shape), but its OUTPUT is
    * plain arithmetic over the payload bytes — so it is oracle-checkable:
    * [[featureExtractSql]] reproduces the stub math in SQL, and
    * [[featureExtractExpr]] is an all-expression twin that MultimodalSpec
    * asserts row-identical to this path. */
  def featureExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = mediaTable(spark, dir).as[MediaRecord]
    decodeFeatures(media).toDF()
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        max(col("width")).as("max_width"),
        max(col("height")).as("max_height"),
        sum(col("n_frames").cast(LongType)).as("total_frames"))
      .orderBy(col("kind"))
  }

  /** Expression-form twin of [[featureExtract]]: the same stub-codec math
    * as pure Catalyst column ops (no JVM round-trip). Used by the spec to
    * cross-check the mapPartitions path; at scale this form is preferable
    * whenever the "codec" is arithmetic (stays inside codegen). */
  def featureExtractExpr(spark: SparkSession, dir: String): DataFrame = {
    val n = octet_length(col("content")).cast(LongType)
    // unsigned byte at pos: slice the ONE needed byte first, then hex it —
    // hexing the whole payload to read a prefix was O(payload) per row
    // with a 2× transient string (avoids signed getbyte either way)
    def byteAt(pos: Int): Column =
      when(n >= pos, conv(hex(substring(col("content"), pos, 1)), 16, 10)
        .cast(IntegerType)).otherwise(lit(0))
    val width = (lit(16) + when(n === 0, 0).otherwise(pmod(byteAt(1), lit(64))))
      .cast(IntegerType)
    val height = (lit(16) + when(n < 2, 0).otherwise(pmod(byteAt(2), lit(64))))
      .cast(IntegerType)
    val frames = when(col("kind") === "video", lit(1L) + floor(n / 64))
      .otherwise(lit(1L)).cast(LongType)
    mediaTable(spark, dir)
      .select(col("kind"), n.as("n_bytes"), width.as("width"),
        height.as("height"), frames.as("n_frames"))
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        max(col("width")).as("max_width"),
        max(col("height")).as("max_height"),
        sum(col("n_frames")).as("total_frames"))
      .orderBy(col("kind"))
  }

  /** DuckDB oracle for mm2: the stub-codec math in SQL, byte-based
    * (`encode` → UTF-8 bytes, hex-pair prefix → unsigned byte) so parity
    * holds even if fixtures gain non-ASCII text — `ord`/`substr` would
    * read code points where Spark reads raw bytes. */
  val featureExtractSql: String =
    """WITH m AS (SELECT
      |    ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
      |    octet_length(encode(text)) AS n,
      |    CASE WHEN octet_length(encode(text)) >= 1
      |      THEN CAST('0x' || substr(hex(encode(text)), 1, 2) AS INT) ELSE 0 END AS b0,
      |    CASE WHEN octet_length(encode(text)) >= 2
      |      THEN CAST('0x' || substr(hex(encode(text)), 3, 2) AS INT) ELSE 0 END AS b1
      |  FROM documents),
      |f AS (SELECT kind, n,
      |    CAST(16 + (CASE WHEN n = 0 THEN 0 ELSE b0 % 64 END) AS INT) AS width,
      |    CAST(16 + (CASE WHEN n < 2 THEN 0 ELSE b1 % 64 END) AS INT) AS height,
      |    CASE WHEN kind = 'video' THEN 1 + n // 64 ELSE 1 END AS n_frames
      |  FROM m)
      |SELECT kind, COUNT(*) AS n_media, CAST(SUM(n) AS BIGINT) AS total_bytes,
      |  MAX(width) AS max_width, MAX(height) AS max_height,
      |  CAST(SUM(n_frames) AS BIGINT) AS total_frames
      |FROM f GROUP BY kind ORDER BY kind""".stripMargin

  /** Frame-sampling statistics per kind (stride 16): pure column math over
    * the binary payload — the count the sampleFrames array would have. */
  def frameStats(spark: SparkSession, dir: String): DataFrame = {
    val frames = greatest(floor(octet_length(col("content")) / 16), lit(1))
      .cast(LongType)
    mediaTable(spark, dir)
      .select(col("kind"), frames.as("n_frames"))
      .groupBy(col("kind"))
      .agg(sum(col("n_frames")).as("total_frames"),
        max(col("n_frames")).as("max_frames"),
        min(col("n_frames")).as("min_frames"))
      .orderBy(col("kind"))
  }

  val frameStatsSql: String =
    """WITH m AS (SELECT ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
      |    greatest(octet_length(encode(text)) // 16, 1) AS n_frames
      |  FROM documents)
      |SELECT kind, CAST(SUM(n_frames) AS BIGINT) AS total_frames,
      |  MAX(n_frames) AS max_frames, MIN(n_frames) AS min_frames
      |FROM m GROUP BY kind ORDER BY kind""".stripMargin

  // ------------------------------------------------------------ mm4

  private val ResizeMaxBytes = 96
  private val ThumbBox = 32

  /** Resize planning + payload downscale (mm4): stub-codec dims fitted
    * into a [[ThumbBox]]² box with aspect preserved (pure integer math —
    * floor((d·box)/maxdim), exact in both engines), and the payload run
    * through [[resize]] (prefix truncation at [[ResizeMaxBytes]], the
    * byte-level downscale analogue). Dims read the PREFIX bytes, so they
    * are invariant under the truncation — asserted by construction here,
    * the property a real thumbnailer relies on (header before pixels).
    * Zero shuffle: per-row column ops end to end. */
  def resizePlan(spark: SparkSession, dir: String): DataFrame = {
    val m = resize(
      mediaTable(spark, dir)
        .withColumn("orig_bytes", octet_length(col("content")).cast(LongType)),
      ResizeMaxBytes)
    val n = col("orig_bytes")
    def byteAt(pos: Int): Column =
      when(n >= pos, conv(hex(substring(col("content"), pos, 1)), 16, 10)
        .cast(IntegerType)).otherwise(lit(0))
    val width = (lit(16) + when(n === 0, 0).otherwise(pmod(byteAt(1), lit(64))))
      .cast(IntegerType)
    val height = (lit(16) + when(n < 2, 0).otherwise(pmod(byteAt(2), lit(64))))
      .cast(IntegerType)
    val maxDim = greatest(width, height)
    m.select(
      col("media_id"), col("kind"),
      width.as("width"), height.as("height"),
      floor(width * ThumbBox / maxDim).cast(IntegerType).as("thumb_w"),
      floor(height * ThumbBox / maxDim).cast(IntegerType).as("thumb_h"),
      col("orig_bytes"),
      octet_length(col("content")).cast(LongType).as("resized_bytes"))
      .orderBy(col("media_id"))
  }

  val resizePlanSql: String =
    s"""WITH m AS (SELECT doc_id AS media_id,
       |    ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
       |    octet_length(encode(text)) AS n,
       |    CASE WHEN octet_length(encode(text)) >= 1
       |      THEN CAST('0x' || substr(hex(encode(text)), 1, 2) AS INT) ELSE 0 END AS b0,
       |    CASE WHEN octet_length(encode(text)) >= 2
       |      THEN CAST('0x' || substr(hex(encode(text)), 3, 2) AS INT) ELSE 0 END AS b1
       |  FROM documents),
       |d AS (SELECT media_id, kind, n,
       |    CAST(16 + (CASE WHEN n = 0 THEN 0 ELSE b0 % 64 END) AS INT) AS width,
       |    CAST(16 + (CASE WHEN n < 2 THEN 0 ELSE b1 % 64 END) AS INT) AS height
       |  FROM m)
       |SELECT media_id, kind, width, height,
       |  CAST((width * $ThumbBox) // greatest(width, height) AS INT) AS thumb_w,
       |  CAST((height * $ThumbBox) // greatest(width, height) AS INT) AS thumb_h,
       |  CAST(n AS BIGINT) AS orig_bytes,
       |  CAST(least(n, $ResizeMaxBytes) AS BIGINT) AS resized_bytes
       |FROM d ORDER BY media_id""".stripMargin

  // ------------------------------------------------------------ mm5

  /** Perceptual-hash parameters: 64-bit signature over overlapping
    * [[PhashWindowBytes]]-byte windows (stride 1), banded 4×16 for the
    * hamming join (same pigeonhole + bucket-cap scheme as dd5 — hamming
    * ≤ 3 always shares a full block). */
  private val PhashWindowBytes = 8
  private val PhashHammingMax = 3
  private val PhashBlocks = 4
  private val PhashBlockBits = 64 / PhashBlocks
  private val PhashBucketCap = 50
  /** Tail-stripped variant ids live [[VariantOffset]] above the original. */
  private val VariantOffset = 10000000L
  /** Bytes stripped off the tail for the variant corpus — the metadata-
    * tail (EXIF-strip) duplicate class. SimHash hamming grows ~√(changed
    * fraction), so a small absolute strip keeps true variants inside
    * [[PhashHammingMax]] for all but the shortest payloads (measured on
    * the fixture: ~75% of ≥256-byte payloads land at hamming ≤ 3). */
  private val VariantTailBytes = 8

  /** 64-bit perceptual hash of a binary payload: SimHash over OVERLAPPING
    * [[PhashWindowBytes]]-byte windows at stride 1 (hex-encoded tokens).
    * Pure scan-side column math — the byte-stream stand-in for a DCT
    * pHash. Overlapping windows give ~n votes per signature bit, so a
    * localized edit of k bytes perturbs only ~k+w windows and the
    * signature moves O(√k) bits — robust to tail strips and small
    * patches; content-wide re-encodes need a decoded-domain hash a real
    * codec would supply ([[StubCodec]] slot). */
  private def phash: Column =
    graft.functions.TextHashFunctions.phash64(col("content"), PhashWindowBytes)

  /** The composable rendering of [[phash]] — kept as the readable
    * reference implementation and the parity twin the spec asserts
    * row-identical to the native expression (same pattern as mm2's
    * expression twin and Dedup.cosineHof). */
  private[graft] def phashComposable: Column = {
    val h = lower(hex(col("content")))
    val nWindows = greatest(
      octet_length(col("content")) - (PhashWindowBytes - 1), lit(1))
      .cast(IntegerType)
    val grams = transform(sequence(lit(1), nWindows),
      i => h.substr((i - 1) * lit(2) + 1, lit(PhashWindowBytes * 2)))
    graft.functions.TextHashFunctions.simhash64(grams)
  }

  /** Perceptual-hash near-dup pairs over media payloads (mm5): the corpus
    * plus a tail-stripped variant of every payload (last
    * [[VariantTailBytes]] bytes removed, ids offset by [[VariantOffset]]
    * — the "same media, different metadata tail" duplicate class),
    * fingerprinted with [[phash]] and joined by banded hamming exactly
    * like dd5: block equi-join on 16-bit blocks, capped buckets, pairs
    * off each sorted capped list, verify hamming ≤ [[PhashHammingMax]].
    *
    * Scale posture: media BYTES never shuffle — the phash is computed at
    * the scan and only (id, 64-char signature) rows enter the exchange;
    * candidate volume is bounded per bucket by C(cap, 2). */
  /** Session-level signature cache: the corpus+variant phash table is the
    * "materialize once per corpus snapshot" artifact (same contract and
    * staleness caveat as Dedup's gramsCache — rewrite the parquet under
    * `dir` within a session and you must [[clearSignatures]] first). At
    * sf0.1 the signature pass is ~10 s of md5 windows over every payload;
    * recomputing it per query run is exactly the round-2 leak-class
    * mistake in reverse — pay the scan once, reuse the 70-byte rows. */
  private val phashCache = SessionCache.persisted()

  /** Drop this session's cached phash signatures (companion of
    * [[graft.llmdata.Dedup.uncacheShingles]], which calls it). */
  def clearSignatures(spark: SparkSession): Unit = {
    phashCache.clear(spark)
    decodedPhashCache.clear(spark)
    ppmPhashCache.clear(spark)
  }

  private def signatures(spark: SparkSession, dir: String): DataFrame =
    phashCache.get(spark, dir) {
      val base = mediaTable(spark, dir)
      val variants = base
        .withColumn("content",
          col("content").substr(lit(1),
            greatest(octet_length(col("content")) - VariantTailBytes, lit(1))
              .cast(IntegerType)))
        .withColumn("media_id", col("media_id") + VariantOffset)
      base.unionByName(variants)
        .select(col("media_id"), phash.as("ph")).persist()
    }

  /** dd5's banded hamming join over any (media_id, ph) signature table:
    * 16-bit block equi-join, capped buckets, pairs off each sorted capped
    * list, verify hamming ≤ [[PhashHammingMax]]. Shared by mm5 (byte-
    * domain signatures) and mm6 (decoded-domain signatures). */
  private def bandedHammingPairs(sh: DataFrame): DataFrame = {
    val blocks = sh.select(col("media_id"),
      posexplode_outer(array((0 until PhashBlocks).map(b =>
        substring(col("ph"), b * PhashBlockBits + 1, PhashBlockBits)): _*))
        .as(Seq("blk", "bv")))
    val buckets = blocks.groupBy(col("blk"), col("bv"))
      .agg(slice(sort_array(collect_list(col("media_id"))), 1, PhashBucketCap)
        .as("ids"))
    // native pair generator (Dedup.cappedBucketPairsRaw's rationale);
    // single-id buckets yield a null array → explode_outer's null row →
    // dropped by the verify equi-join
    val cands = buckets.select(explode_outer(
      graft.functions.TextHashFunctions.sortedPairs(col("ids"))).as("p"))
      .select(col("p.doc_a").as("media_a"), col("p.doc_b").as("media_b"))
      .distinct()
    val sa = sh.select(col("media_id").as("media_a"), col("ph").as("ph_a"))
    val sb = sh.select(col("media_id").as("media_b"), col("ph").as("ph_b"))
    val hamming = graft.functions.TextHashFunctions.hamming(col("ph_a"), col("ph_b"))
    cands.join(sa, "media_a").join(sb, "media_b")
      .select(col("media_a"), col("media_b"), hamming.as("hamming"))
      .filter(col("hamming") <= PhashHammingMax)
      .orderBy(col("media_a"), col("media_b"))
  }

  def phashNearDup(spark: SparkSession, dir: String): DataFrame =
    bandedHammingPairs(signatures(spark, dir))

  /** DuckDB oracle for mm5: hex prefix of a payload ≡ payload prefix
    * (2 hex chars per byte), so the tail-stripped variant is
    * `substr(h, 1, len(h) − 2·VariantTailBytes)`; the SimHash bit math
    * mirrors TextHashUtil.simhashBits exactly as dd4's oracle does. */
  val phashNearDupSql: String = {
    val gl = PhashWindowBytes * 2
    s"""WITH m0 AS (SELECT doc_id AS media_id, lower(hex(encode(text))) AS h
       |            FROM documents),
       |m AS (SELECT media_id, h FROM m0
       |      UNION ALL
       |      SELECT media_id + $VariantOffset,
       |        substr(h, 1, greatest(len(h) - ${VariantTailBytes * 2}, 2))
       |      FROM m0),
       |g AS (SELECT media_id, list_transform(
       |        generate_series(1, greatest((len(h) // 2) - ${PhashWindowBytes - 1}, 1)),
       |        i -> substr(h, (i-1)*2 + 1, $gl)) AS grams FROM m),
       |tok AS (SELECT media_id, substr(md5(unnest(grams)), 1, 16) AS th FROM g),
       |bits AS (SELECT media_id, p,
       |    SUM(CASE WHEN
       |      floor((strpos('0123456789abcdef', substr(th, ((p-1)//4)+1, 1)) - 1)
       |            // power(2, 3-((p-1)%4))) % 2 = 1
       |      THEN 1 ELSE -1 END) AS vote
       |  FROM tok CROSS JOIN (SELECT unnest(generate_series(1,64)) AS p)
       |  GROUP BY media_id, p),
       |ph AS (SELECT media_id,
       |         string_agg(CASE WHEN vote > 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS ph
       |       FROM bits GROUP BY media_id),
       |blocks AS (SELECT media_id, ph, blk,
       |             substr(ph, blk*$PhashBlockBits+1, $PhashBlockBits) AS bv
       |           FROM ph CROSS JOIN
       |             (SELECT unnest(generate_series(0,${PhashBlocks - 1})) AS blk)),
       |capped AS (SELECT media_id, blk, bv FROM blocks
       |           QUALIFY row_number() OVER (PARTITION BY blk, bv
       |             ORDER BY media_id) <= $PhashBucketCap),
       |cands AS (SELECT DISTINCT x.media_id AS media_a, y.media_id AS media_b
       |          FROM capped x JOIN capped y
       |            ON x.blk = y.blk AND x.bv = y.bv AND x.media_id < y.media_id)
       |SELECT media_a, media_b,
       |  len(list_filter(generate_series(1,64),
       |    i -> substr(a.ph, i, 1) <> substr(b.ph, i, 1))) AS hamming
       |FROM cands JOIN ph a ON cands.media_a = a.media_id
       |           JOIN ph b ON cands.media_b = b.media_id
       |WHERE len(list_filter(generate_series(1,64),
       |    i -> substr(a.ph, i, 1) <> substr(b.ph, i, 1))) <= $PhashHammingMax
       |ORDER BY media_a, media_b""".stripMargin
  }

  // ------------------------------------------------------------ mm6

  /** Re-encoded variant ids live [[ReencodeOffset]] above the original. */
  private val ReencodeOffset = 20000000L

  /** The [[StubCodec.reencode]] math as a COMPOSABLE column expression over
    * a MATERIALIZED hex column `h` (lambda-referenced expressions
    * re-evaluate per element — the bigrams caveat): per byte, keep the
    * high-nibble hex char, emit low nibble = (hi + 7) mod 16. Kept as the
    * readable parity twin (mm5's phashComposable pattern); the query path
    * uses the native [[graft.functions.TextHashFunctions.stubReencode]] —
    * each lambda element here pays an O(len) substr over `h`, O(len²)/row. */
  private[graft] def reencodedHex: Column =
    concat_ws("", transform(sequence(lit(1), (length(col("h")) / 2).cast(IntegerType)), { i =>
      val hi = col("h").substr(i * 2 - 1, lit(1))
      val v = conv(hi, 16, 10).cast(IntegerType)
      concat(hi, lit(StubCodecHexDigits).substr(pmod(v + 7, lit(16)) + 1, lit(1)))
    }))

  private val StubCodecHexDigits = "0123456789abcdef"

  /** [[StubCodec.decodeSignal]] as a column expression: the high-nibble
    * hex chars, i.e. the odd positions of the materialized hex column
    * (`h` is referenced twice, so CollapseProject keeps it materialized —
    * the bigrams caveat). */
  private[graft] def signalOf: Column =
    concat_ws("", transform(sequence(lit(1), (length(col("h")) / 2).cast(IntegerType)),
      i => col("h").substr(i * 2 - 1, lit(1))))

  /** Decoded-domain phash, COMPOSABLE form: SimHash over overlapping
    * [[PhashWindowBytes]]-char windows of the SIGNAL column `s` (stride 1)
    * — mm5's scheme moved from file bytes to decoded content. Parity twin
    * of the native [[graft.functions.TextHashFunctions.decodedPhash64]]
    * the query path runs (each window substr over `s` is O(len), so this
    * form is O(len²)/row — the mm5 phashComposable pattern). */
  private[graft] def decodedPhashComposable: Column = {
    val nWindows = greatest(length(col("s")) - (PhashWindowBytes - 1), lit(1))
      .cast(IntegerType)
    graft.functions.TextHashFunctions.simhash64(
      transform(sequence(lit(1), nWindows),
        i => col("s").substr(i, lit(PhashWindowBytes))))
  }

  /** DECODED-domain perceptual near-dup (mm6): the duplicate class mm5
    * structurally cannot catch. A re-encode rewrites nearly every file
    * byte (here: [[StubCodec.reencode]] — low nibbles replaced), so the
    * byte-stream phash lands far beyond [[PhashHammingMax]]; hashing the
    * DECODED signal instead ([[StubCodec.decodeSignal]] — what a real
    * codec's pixel/sample plane gives the [[StubCodec]] slot) is invariant
    * under re-encoding, so every (original, re-encoded) pair clusters at
    * hamming 0. The corpus is every payload plus its re-encoded variant
    * (ids offset by [[ReencodeOffset]]); candidates and verification are
    * [[bandedHammingPairs]], identical to mm5.
    *
    * The query runs the codec math as scan-side column expressions (stays
    * in codegen; MultimodalSpec asserts the native expressions AND the
    * composable twins char-identical to the StubCodec JVM path through
    * mapPartitions, mm2's cross-check pattern). Scale posture: payload
    * bytes never shuffle — only (id, 64-bit signature) rows enter the
    * exchange; like mm5's [[signatures]], the signature table is the
    * build-once-per-corpus-snapshot artifact, cached for the session. */
  private val decodedPhashCache = SessionCache.persisted()

  private def decodedSignatures(spark: SparkSession, dir: String): DataFrame =
    decodedPhashCache.get(spark, dir) {
      val m0 = mediaTable(spark, dir).select(col("media_id"), col("content"))
      val reenc = m0.select((col("media_id") + ReencodeOffset).as("media_id"),
        graft.functions.TextHashFunctions.stubReencode(col("content")).as("content"))
      m0.unionByName(reenc)
        .select(col("media_id"), graft.functions.TextHashFunctions
          .decodedPhash64(col("content"), PhashWindowBytes).as("ph"))
        .persist()
    }

  def phashDecodedNearDup(spark: SparkSession, dir: String): DataFrame =
    bandedHammingPairs(decodedSignatures(spark, dir))

  /** DuckDB oracle for mm6: the full stub-codec round trip reproduced in
    * SQL — re-encoded hex built char-pair by char-pair, signals re-read
    * from BOTH hex strings by the same odd-position rule, then mm5's
    * SimHash/banding/hamming machinery over the signals. */
  val phashDecodedNearDupSql: String = {
    val hx = "'0123456789abcdef'"
    s"""WITH m0 AS (SELECT doc_id AS media_id, lower(hex(encode(text))) AS h
       |            FROM documents),
       |reenc AS (SELECT media_id + $ReencodeOffset AS media_id,
       |    array_to_string(list_transform(generate_series(1, len(h) // 2),
       |      i -> substr(h, 2*i - 1, 1) ||
       |        substr($hx, ((strpos($hx, substr(h, 2*i - 1, 1)) - 1 + 7) % 16) + 1, 1)),
       |      '') AS h
       |  FROM m0),
       |m AS (SELECT media_id, h FROM m0 UNION ALL SELECT media_id, h FROM reenc),
       |sig AS (SELECT media_id,
       |    array_to_string(list_transform(generate_series(1, len(h) // 2),
       |      i -> substr(h, 2*i - 1, 1)), '') AS s
       |  FROM m),
       |g AS (SELECT media_id, list_transform(
       |        generate_series(1, greatest(len(s) - ${PhashWindowBytes - 1}, 1)),
       |        i -> substr(s, i, $PhashWindowBytes)) AS grams FROM sig),
       |tok AS (SELECT media_id, substr(md5(unnest(grams)), 1, 16) AS th FROM g),
       |bits AS (SELECT media_id, p,
       |    SUM(CASE WHEN
       |      floor((strpos('0123456789abcdef', substr(th, ((p-1)//4)+1, 1)) - 1)
       |            // power(2, 3-((p-1)%4))) % 2 = 1
       |      THEN 1 ELSE -1 END) AS vote
       |  FROM tok CROSS JOIN (SELECT unnest(generate_series(1,64)) AS p)
       |  GROUP BY media_id, p),
       |ph AS (SELECT media_id,
       |         string_agg(CASE WHEN vote > 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS ph
       |       FROM bits GROUP BY media_id),
       |blocks AS (SELECT media_id, ph, blk,
       |             substr(ph, blk*$PhashBlockBits+1, $PhashBlockBits) AS bv
       |           FROM ph CROSS JOIN
       |             (SELECT unnest(generate_series(0,${PhashBlocks - 1})) AS blk)),
       |capped AS (SELECT media_id, blk, bv FROM blocks
       |           QUALIFY row_number() OVER (PARTITION BY blk, bv
       |             ORDER BY media_id) <= $PhashBucketCap),
       |cands AS (SELECT DISTINCT x.media_id AS media_a, y.media_id AS media_b
       |          FROM capped x JOIN capped y
       |            ON x.blk = y.blk AND x.bv = y.bv AND x.media_id < y.media_id)
       |SELECT media_a, media_b,
       |  len(list_filter(generate_series(1,64),
       |    i -> substr(a.ph, i, 1) <> substr(b.ph, i, 1))) AS hamming
       |FROM cands JOIN ph a ON cands.media_a = a.media_id
       |           JOIN ph b ON cands.media_b = b.media_id
       |WHERE len(list_filter(generate_series(1,64),
       |    i -> substr(a.ph, i, 1) <> substr(b.ph, i, 1))) <= $PhashHammingMax
       |ORDER BY media_a, media_b""".stripMargin
  }

  // -------------- mm11: REAL-codec (PPM) decoded-domain near-dup

  /** Re-serialized PPM variant ids live this far above the original. */
  private val PpmReencodeOffset = 30000000L

  /** Deterministic P6 (binary PPM) corpus synthesized from the documents
    * fixture: dims derived from doc_id (8–15 each), pixel plane = the
    * doc's UTF-8 bytes repeated/truncated to exactly width·height·3 —
    * REAL image files with real headers, built entirely from column ops
    * so the DuckDB twin reconstructs the identical bytes. (The driver
    * fixtures ship no media column — TESTDATA.md — so the corpus is
    * derived, like [[mediaTable]]; the difference is these payloads ARE
    * a specified, parseable format, not "text bytes standing in".) */
  private[graft] def ppmMediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .filter(col("text").isNotNull && col("text") =!= "")
      .withColumn("w", (lit(8) + pmod(col("doc_id"), lit(8))).cast(IntegerType))
      .withColumn("h",
        (lit(8) + pmod(floor(col("doc_id") / 8), lit(8))).cast(IntegerType))
      .withColumn("need", (col("w") * col("h") * 3).cast(IntegerType))
      .withColumn("reps",
        floor((col("need") + octet_length(col("text")) - 1)
          / octet_length(col("text"))).cast(IntegerType))
      .select(col("doc_id").as("media_id"),
        concat(
          concat(lit("P6\n"), col("w").cast(StringType), lit(" "),
            col("h").cast(StringType), lit("\n255\n")).cast(BinaryType),
          expr("cast(repeat(text, reps) as binary)")
            .substr(lit(1), col("need"))).as("content"))

  /** mm6 over a REAL codec (r15 verdict task 6): the decoded-domain
    * duplicate class driven through the hand-rolled P6 decoder
    * ([[graft.functions.PpmUtil]]) instead of the stub. The corpus is
    * every synthesized PPM plus its [[graft.functions.PpmReencode]]
    * re-serialization (different file bytes — even a different LENGTH,
    * which the stub's in-place nibble rewrite could not produce — same
    * pixel plane), each hashed by `phash64(ppm_pixels(content))`: a real
    * parse of a real header feeding the decoded-domain signature. Every
    * (original, re-encoded) pair lands at hamming 0 BECAUSE THE DECODER
    * recovered identical planes from differing byte streams — the seam
    * proof the stub tier could only model. Candidates/verification are
    * [[bandedHammingPairs]], identical to mm5/mm6; payload bytes never
    * shuffle (only 64-bit signatures enter the exchange). */
  private val ppmPhashCache = SessionCache.persisted()

  private def ppmSignatures(spark: SparkSession, dir: String): DataFrame =
    ppmPhashCache.get(spark, dir) {
      val m0 = ppmMediaTable(spark, dir)
      val reenc = m0.select(
        (col("media_id") + PpmReencodeOffset).as("media_id"),
        graft.functions.TextHashFunctions.ppmReencode(col("content"))
          .as("content"))
      m0.unionByName(reenc)
        .select(col("media_id"),
          graft.functions.TextHashFunctions.phash64(
            graft.functions.TextHashFunctions.ppmPixels(col("content")),
            PhashWindowBytes).as("ph"))
        .persist()
    }

  def ppmDecodedNearDup(spark: SparkSession, dir: String): DataFrame =
    bandedHammingPairs(ppmSignatures(spark, dir))

  /** DuckDB oracle for mm11: the twin does NOT re-implement the P6
    * parser — it reconstructs the pixel plane from first principles (the
    * same dims + repeat/truncate that built the payload), so equality
    * gates that the Spark-side DECODE of the real container recovered
    * exactly the encoded plane (encode∘decode = id, cross-engine), for
    * the original AND the re-serialized variant. Then mm5's SimHash/
    * banding/hamming machinery over the plane's hex. */
  val ppmDecodedNearDupSql: String = {
    val gl = PhashWindowBytes * 2
    s"""WITH d AS (SELECT doc_id,
       |    8 + CAST(doc_id % 8 AS INT) AS w,
       |    8 + CAST((doc_id // 8) % 8 AS INT) AS h,
       |    lower(hex(encode(text))) AS th,
       |    octet_length(encode(text)) AS nb
       |  FROM documents WHERE text IS NOT NULL AND text <> ''),
       |px AS (SELECT doc_id,
       |    substr(repeat(th,
       |      CAST(floor((w*h*3 + nb - 1.0) / nb) AS INT)), 1, w*h*3*2) AS s
       |  FROM d),
       |m AS (SELECT doc_id AS media_id, s FROM px
       |      UNION ALL
       |      SELECT doc_id + $PpmReencodeOffset, s FROM px),
       |g AS (SELECT media_id, list_transform(
       |        generate_series(1, greatest((len(s) // 2) - ${PhashWindowBytes - 1}, 1)),
       |        i -> substr(s, (i-1)*2 + 1, $gl)) AS grams FROM m),
       |tok AS (SELECT media_id, substr(md5(unnest(grams)), 1, 16) AS th FROM g),
       |bits AS (SELECT media_id, p,
       |    SUM(CASE WHEN
       |      floor((strpos('0123456789abcdef', substr(th, ((p-1)//4)+1, 1)) - 1)
       |            // power(2, 3-((p-1)%4))) % 2 = 1
       |      THEN 1 ELSE -1 END) AS vote
       |  FROM tok CROSS JOIN (SELECT unnest(generate_series(1,64)) AS p)
       |  GROUP BY media_id, p),
       |ph AS (SELECT media_id,
       |         string_agg(CASE WHEN vote > 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS ph
       |       FROM bits GROUP BY media_id),
       |blocks AS (SELECT media_id, ph, blk,
       |             substr(ph, blk*$PhashBlockBits+1, $PhashBlockBits) AS bv
       |           FROM ph CROSS JOIN
       |             (SELECT unnest(generate_series(0,${PhashBlocks - 1})) AS blk)),
       |capped AS (SELECT media_id, blk, bv FROM blocks
       |           QUALIFY row_number() OVER (PARTITION BY blk, bv
       |             ORDER BY media_id) <= $PhashBucketCap),
       |cands AS (SELECT DISTINCT x.media_id AS media_a, y.media_id AS media_b
       |          FROM capped x JOIN capped y
       |            ON x.blk = y.blk AND x.bv = y.bv AND x.media_id < y.media_id)
       |SELECT media_a, media_b,
       |  len(list_filter(generate_series(1,64),
       |    i -> substr(a.ph, i, 1) <> substr(b.ph, i, 1))) AS hamming
       |FROM cands JOIN ph a ON cands.media_a = a.media_id
       |           JOIN ph b ON cands.media_b = b.media_id
       |WHERE len(list_filter(generate_series(1,64),
       |    i -> substr(a.ph, i, 1) <> substr(b.ph, i, 1))) <= $PhashHammingMax
       |ORDER BY media_a, media_b""".stripMargin
  }

  // ------------------------------------ chunk-hash payload dedup (mm7)

  private val ChunkBytes = 64
  private val ChunkDfCap = 8
  private val ChunkJaccardMin = 0.5

  /** Chunk-hash payload near-dup (mm7): fixed-size chunk fingerprints over
    * the RAW payload — the blob-level complement of mm5/mm6's perceptual
    * hashing. Perceptual hashes catch "same picture, different encode";
    * chunk overlap catches "same byte stream, different wrapper" (a
    * re-containered video, an asset with appended EXIF, a truncated
    * upload): payloads sharing ≥ [[ChunkJaccardMin]] of their
    * [[ChunkBytes]]-byte chunk sets pair up even when headers differ and
    * a whole-payload digest (dd1's shape) catches nothing.
    *
    * Scale: the payload collapses to chunk HASHES at the scan (bytes
    * never enter an exchange — the mm-family invariant); candidates come
    * off per-chunk posting lists capped at [[ChunkDfCap]] docs (the dd3
    * C(cap,2) bound); verification is exact set Jaccard over the two
    * chunk arrays — cost proportional to candidates, never all pairs. */
  /** Candidate (media_a < media_b) pairs off a (media_id, chunks) frame —
    * per-chunk posting lists capped at [[ChunkDfCap]], so a degenerate
    * all-identical corpus emits C(cap, 2) pairs, not C(n, 2)
    * (spec-proven, same contract as Dedup.cappedPairsOfBands). */
  private[graft] def chunkCandidates(ch: DataFrame): DataFrame = {
    val capped = ch.select(col("media_id"), explode(col("chunks")).as("c"))
      .groupBy(col("c"))
      .agg(slice(sort_array(collect_list(col("media_id"))), 1, ChunkDfCap)
        .as("docs"))
    // native pair generator (Dedup.cappedBucketPairsRaw's rationale);
    // explode_outer so the generator isn't re-evaluated inside a pushed
    // size(..)>0 filter — the null row for single-doc buckets drops at
    // the downstream equi-join
    capped.select(explode_outer(
      graft.functions.TextHashFunctions.sortedPairs(col("docs"))).as("p"))
      .select(col("p.doc_a").as("media_a"), col("p.doc_b").as("media_b"))
      .distinct()
  }

  def chunkDedup(spark: SparkSession, dir: String): DataFrame = {
    val nChunks = greatest(
      ceil(length(col("text")) / lit(ChunkBytes.toDouble)), lit(1))
      .cast(IntegerType)
    val chunks = array_distinct(transform(
      sequence(lit(1), nChunks),
      i => md5(col("text").substr((i - 1) * ChunkBytes + 1, lit(ChunkBytes)))))
    val ch = Tables.load(spark, dir, "documents")
      .select(col("doc_id").as("media_id"), chunks.as("chunks"))
    val cands = chunkCandidates(ch)
    val a = ch.select(col("media_id").as("media_a"), col("chunks").as("ca"))
    val b = ch.select(col("media_id").as("media_b"), col("chunks").as("cb"))
    cands.join(a, "media_a").join(b, "media_b")
      .select(col("media_a"), col("media_b"),
        size(array_intersect(col("ca"), col("cb"))).cast(LongType).as("n_shared"),
        (size(array_intersect(col("ca"), col("cb"))).cast(DoubleType) /
          size(array_union(col("ca"), col("cb"))).cast(DoubleType)).as("jaccard"))
      .filter(col("jaccard") >= ChunkJaccardMin)
      .orderBy(col("media_a"), col("media_b"))
  }

  val chunkDedupSql: String =
    s"""WITH ch AS (SELECT doc_id AS media_id,
       |    list_distinct(list_transform(
       |      generate_series(1, greatest(CAST(ceil(len(text) / $ChunkBytes.0) AS BIGINT), 1)),
       |      i -> md5(substr(text, CAST((i-1)*$ChunkBytes+1 AS BIGINT), $ChunkBytes)))) AS chunks
       |  FROM documents),
       |pl AS (SELECT media_id, unnest(chunks) AS c FROM ch),
       |capped AS (SELECT media_id, c FROM pl
       |           QUALIFY row_number() OVER (PARTITION BY c ORDER BY media_id) <= $ChunkDfCap),
       |cands AS (SELECT DISTINCT x.media_id AS media_a, y.media_id AS media_b
       |          FROM capped x JOIN capped y
       |            ON x.c = y.c AND x.media_id < y.media_id)
       |SELECT media_a, media_b,
       |  CAST(len(list_intersect(a.chunks, b.chunks)) AS BIGINT) AS n_shared,
       |  CAST(len(list_intersect(a.chunks, b.chunks)) AS DOUBLE) /
       |    CAST(len(list_distinct(a.chunks || b.chunks)) AS DOUBLE) AS jaccard
       |FROM cands JOIN ch a ON cands.media_a = a.media_id
       |           JOIN ch b ON cands.media_b = b.media_id
       |WHERE CAST(len(list_intersect(a.chunks, b.chunks)) AS DOUBLE) /
       |      CAST(len(list_distinct(a.chunks || b.chunks)) AS DOUBLE) >= $ChunkJaccardMin
       |ORDER BY media_a, media_b""".stripMargin

  // ------------------------------------------------------------ mm8

  /** Entropy flag threshold (micro-nats/byte): above this a payload reads
    * as compressed/encrypted-like (uniform bytes → ln 256 ≈ 5.545 nats;
    * plain text sits near 2.5–3.2). */
  private val HighEntropyMicroNats = 4500000L

  /** mm8: payload byte-entropy profile — the "is this blob already
    * compressed/encrypted?" triage signal. Magic-byte sniffing (mm1's
    * header census) identifies CONTAINERS; a raw/container-less stream
    * (embedded JPEG scan data, encrypted chunks, random padding) is only
    * visible through its byte DISTRIBUTION: Shannon entropy of the byte
    * histogram approaches ln 256 for compressed/encrypted payloads and
    * sits far lower for text, sparse binaries, and bitmaps. A training
    * pipeline uses this to skip re-compression, flag undecodable media
    * before the codec pays for the failure, and catch corrupted/
    * truncated-to-garbage payloads.
    *
    * Exactness (cur10's discipline on an inherently-float measure): each
    * histogram CELL's entropy term c·ln(n/c)/n is quantized ONCE to
    * integer micro-nats off exact (c, n) BIGINTs; the per-payload entropy
    * is then a ≤ 256-term BIGINT sum (order-free), the flag an integer
    * compare, and the reported nats one final division.
    *
    * Scale shape: ONE hex pass per payload at the scan, then the
    * (media, byte)-keyed count — map-side combine collapses each payload
    * to ≤ 256 cells before the exchange, so the shuffle carries histogram
    * cells, not payload bytes (mm7's chunk-hash contract: derived
    * features cross, bodies never do). Rollup joins are per-media. */
  def byteEntropy(spark: SparkSession, dir: String): DataFrame = {
    val m = mediaTable(spark, dir)
      .select(col("media_id"), col("kind"),
        octet_length(col("content")).cast(LongType).as("n_bytes"),
        lower(hex(col("content"))).as("hx"))
      .filter(col("n_bytes") > 0)
    // explode the POSITION, extract the hex pair as a plain projection:
    // a transform(sequence, i -> substring(...)) lambda would evaluate
    // interpreted per byte (~5M frames at sf0.1 — it benched 3.1 s);
    // this shape keeps the extraction inside WholeStageCodegen (0.4 s)
    val cells = m
      .select(col("media_id"), col("kind"), col("n_bytes"), col("hx"),
        explode(sequence(lit(1), col("n_bytes").cast(IntegerType))).as("i"))
      .select(col("media_id"), col("kind"), col("n_bytes"),
        col("hx").substr(col("i") * 2 - 1, lit(2)).as("bh"))
      .groupBy(col("media_id"), col("kind"), col("n_bytes"), col("bh"))
      .agg(count(lit(1)).as("c"))
    val terms = cells.select(col("media_id"), col("kind"), col("n_bytes"),
      round(lit(1000000.0) * col("c").cast(DoubleType) *
        log(col("n_bytes").cast(DoubleType) / col("c").cast(DoubleType)) /
        col("n_bytes").cast(DoubleType)).cast(LongType).as("term_micro"))
    terms.groupBy(col("media_id"), col("kind"), col("n_bytes"))
      .agg(count(lit(1)).as("n_distinct_bytes"),
        sum(col("term_micro")).as("entropy_micro"))
      .select(col("media_id"), col("kind"), col("n_bytes"),
        col("n_distinct_bytes"), col("entropy_micro"),
        (col("entropy_micro").cast(DoubleType) / lit(1000000.0)).as("entropy_nats"),
        (col("entropy_micro") > HighEntropyMicroNats).as("high_entropy"))
      .orderBy(col("media_id"))
  }

  val byteEntropySql: String =
    s"""WITH m AS (SELECT doc_id AS media_id,
       |    ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
       |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       |    lower(hex(encode(text))) AS hx
       |  FROM documents WHERE octet_length(encode(text)) > 0),
       |pos AS (SELECT media_id, kind, n_bytes, hx,
       |    unnest(generate_series(1, CAST(n_bytes AS INT))) AS i FROM m),
       |cells AS (SELECT media_id, kind, n_bytes, substr(hx, i*2-1, 2) AS bh,
       |    CAST(COUNT(*) AS BIGINT) AS c
       |  FROM pos GROUP BY media_id, kind, n_bytes, bh),
       |terms AS (SELECT media_id, kind, n_bytes,
       |    CAST(round(1000000.0 * CAST(c AS DOUBLE) *
       |      ln(CAST(n_bytes AS DOUBLE) / CAST(c AS DOUBLE)) /
       |      CAST(n_bytes AS DOUBLE)) AS BIGINT) AS term_micro
       |  FROM cells)
       |SELECT media_id, kind, n_bytes,
       |  CAST(COUNT(*) AS BIGINT) AS n_distinct_bytes,
       |  CAST(SUM(term_micro) AS BIGINT) AS entropy_micro,
       |  CAST(SUM(term_micro) AS DOUBLE) / 1000000.0 AS entropy_nats,
       |  CAST(SUM(term_micro) AS BIGINT) > $HighEntropyMicroNats AS high_entropy
       |FROM terms GROUP BY media_id, kind, n_bytes
       |ORDER BY media_id""".stripMargin

  // -------------------------- content-defined chunking census (mm9)

  /** Rolling-hash cut divisor: a position cuts when the 4-byte window
    * hash ≡ 0 (mod [[CdcCutDivisor]]) — expected chunk length ≈ the
    * divisor (LBFS/rsync's rule; restic/borg use the same principle with
    * wider windows). 32 sizes chunks to the fixture's ~300-byte docs;
    * production tunes divisor and adds min/max chunk clamps. */
  private val CdcCutDivisor = 32

  /** Content-defined chunk rows (media_id, h, len) over a (media_id,
    * text) frame — the battery path: ONE native codegen expression
    * ([[graft.functions.CdcChunkList]]) does the whole rolling-hash scan
    * + cut + md5 pass per document in a single JVM loop over the payload
    * BYTES, then a plain explode of the chunk structs. Replaces the
    * staged explode form (one generated row per payload byte through six
    * expressions — mm9's 3.5 s battery max at sf0.1; the `winnow_fps`
    * nativization precedent). [[cdcChunkRowsStaged]] is kept as the A/B
    * parity baseline — bit-identical on arbitrary (incl. non-ASCII)
    * payloads, spec-pinned. */
  private[graft] def cdcChunkRows(docs: DataFrame): DataFrame =
    docs.select(col("media_id"),
        explode(graft.functions.TextHashFunctions.cdcChunks(
          encode(col("text"), "UTF-8"), CdcCutDivisor)).as("c"))
      .select(col("media_id"), col("c.h").as("h"), col("c.len").as("len"))

  /** The staged composable form of [[cdcChunkRows]] (cuts → bounds →
    * exploded k → chunk), kept as the A/B parity baseline for the native
    * expression (the dd24 discipline). Built in STAGES so every
    * expression stays a small tree: the single-expression nested-lambda
    * form inlined the bounds subtree into each of its four references and
    * Catalyst spent MINUTES (SF-independent) analyzing it — measured, not
    * assumed. Fully BYTE-indexed (r12 ADVICE fix): n counts payload
    * BYTES, the rolling window reads the binary payload, and chunk slices
    * + md5 run over `bin.substr` (an O(1) byte slice; string substr
    * counts codepoints from offset 0 — O(position) per call, O(n²) per
    * payload, and char-indexed slicing at byte-derived cut positions
    * broke the tiling property for non-ASCII payloads). */
  private[graft] def cdcChunkRowsStaged(docs: DataFrame): DataFrame = {
    val binDocs = docs.select(col("media_id"),
      encode(col("text"), "UTF-8").as("bin"))
    val n = length(col("bin")).cast(LongType)
    // cut detection is explode + codegen'd projections, NOT an
    // interpreted filter(sequence(...)) lambda (the mm8 HOF-vs-explode
    // lesson: 25.8 s interpreted at sf0.1). One hex() of the 4-byte
    // window yields the byte values as 2-char slices.
    val w = hex(col("bin").substr((col("i") - lit(3L)).cast(IntegerType),
      lit(4)))
    // ONE hex→BIGINT conversion per window; byte values come out with
    // shifts and masks (`/` on longs is DOUBLE division in Spark —
    // integer extraction must shift)
    def bv(k: Int): Column =
      shiftright(col("v"), 8 * (4 - k)) % lit(256L)
    val cutRows = binDocs.filter(length(col("bin")) >= 4)
      .select(col("media_id"), col("bin"),
        explode(sequence(lit(4L), n)).as("i"))
      .withColumn("v", conv(w, 16, 10).cast(LongType))
      .filter((bv(1) * lit(29791L) + bv(2) * lit(961L) +
        bv(3) * lit(31L) + bv(4)) % lit(CdcCutDivisor.toLong) === 0L)
      .select(col("media_id"), col("i").as("cut"))
    val cuts = cutRows.groupBy(col("media_id"))
      .agg(sort_array(collect_list(col("cut"))).as("cuts"))
    binDocs
      .join(cuts, Seq("media_id"), "left")
      .withColumn("b", concat(array(lit(0L)),
        coalesce(col("cuts"), array().cast(ArrayType(LongType))), array(n)))
      .select(col("media_id"), col("bin"), col("b"),
        explode(sequence(lit(1), size(col("b")) - 1)).as("k"))
      .select(col("media_id"),
        (element_at(col("b"), col("k") + 1) - element_at(col("b"), col("k")))
          .as("len"),
        md5(col("bin").substr(
          (element_at(col("b"), col("k")) + 1L).cast(IntegerType),
          (element_at(col("b"), col("k") + 1) - element_at(col("b"), col("k")))
            .cast(IntegerType))).as("h"))
      .filter(col("len") > 0L)
      .select(col("media_id"), col("h"), col("len"))
  }

  /** mm9: CONTENT-DEFINED chunking dedup census (LBFS 2001 / rsync;
    * restic & borgbackup's storage model) — the robustness upgrade over
    * mm7's fixed-size grid: a fixed grid mis-aligns every chunk after one
    * inserted/deleted byte (a re-muxed header, a prepended tag), while
    * content-defined cut points re-synchronize immediately, so shifted
    * copies keep sharing chunk hashes. Output is the per-payload dedup
    * ledger a chunk store bills by: chunk count, bytes, and how many of
    * those chunks/bytes already exist in ANOTHER payload (cross-payload
    * df ≥ 2), i.e. the storage the chunk store would NOT re-write.
    *
    * Scale: chunking is scan-side (payload bytes never shuffle — the
    * mm-family invariant); the only exchange carries (chunk-hash, id,
    * len) rows — ~bytes/divisor per payload; the df rollup is one
    * combinable per-hash aggregate and the join back is key-equality on
    * the hash. At a real chunk store this IS the dedup lookup table. */
  def contentChunkCensus(spark: SparkSession, dir: String): DataFrame = {
    val rows = cdcChunkRows(Tables.load(spark, dir, "documents")
      .select(col("doc_id").as("media_id"), col("text")))
    val df = rows.groupBy(col("h"))
      .agg(countDistinct(col("media_id")).as("docs_with"))
    rows.join(df, "h")
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("len")).as("bytes_total"),
        sum(when(col("docs_with") >= 2, 1L).otherwise(0L)).as("n_shared"),
        sum(when(col("docs_with") >= 2, col("len")).otherwise(0L))
          .as("bytes_shared"))
      .select(col("media_id"), col("n_chunks"), col("bytes_total"),
        col("n_shared"), col("bytes_shared"),
        (col("n_shared").cast(DoubleType) / col("n_chunks").cast(DoubleType))
          .as("shared_frac"))
      .orderBy(col("media_id"))
  }

  /** Twin note: the engine defines chunking over payload BYTES (the CDC
    * standard); DuckDB 1.0 cannot md5 a BLOB slice, so the twin works in
    * character space — coincident with the byte definition on the ASCII
    * fixture (documented divergence; the byte-space contract itself is
    * pinned by the non-ASCII native≡staged parity spec). */
  val contentChunkCensusSql: String =
    s"""WITH d AS (SELECT doc_id AS media_id, text, CAST(len(text) AS BIGINT) AS n
       |           FROM documents),
       |cuts AS (SELECT media_id, text, n,
       |           CASE WHEN n >= 4 THEN list_filter(generate_series(4, n), i ->
       |             (ascii(substr(text, CAST(i - 3 AS BIGINT), 1)) * 29791 +
       |              ascii(substr(text, CAST(i - 2 AS BIGINT), 1)) * 961 +
       |              ascii(substr(text, CAST(i - 1 AS BIGINT), 1)) * 31 +
       |              ascii(substr(text, CAST(i AS BIGINT), 1)))
       |             % $CdcCutDivisor = 0)
       |           ELSE [] END AS cuts
       |         FROM d),
       |bounds AS (SELECT media_id, text, [CAST(0 AS BIGINT)] || cuts || [n] AS b
       |           FROM cuts),
       |ks AS (SELECT media_id, text, b,
       |         unnest(generate_series(1, len(b) - 1)) AS k
       |       FROM bounds),
       |chunks AS (SELECT media_id,
       |             md5(substr(text, b[k] + 1, b[k+1] - b[k])) AS h,
       |             b[k+1] - b[k] AS len
       |           FROM ks WHERE b[k+1] - b[k] > 0),
       |df AS (SELECT h, CAST(COUNT(DISTINCT media_id) AS BIGINT) AS docs_with
       |       FROM chunks GROUP BY h)
       |SELECT c.media_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_chunks,
       |  CAST(SUM(c.len) AS BIGINT) AS bytes_total,
       |  CAST(SUM(CASE WHEN f.docs_with >= 2 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_shared,
       |  CAST(SUM(CASE WHEN f.docs_with >= 2 THEN c.len ELSE 0 END) AS BIGINT)
       |    AS bytes_shared,
       |  CAST(SUM(CASE WHEN f.docs_with >= 2 THEN 1 ELSE 0 END) AS DOUBLE) /
       |    CAST(COUNT(*) AS DOUBLE) AS shared_frac
       |FROM chunks c JOIN df f USING (h)
       |GROUP BY c.media_id
       |ORDER BY c.media_id""".stripMargin

  // ---------------- mm10: interleaved multimodal sequence packing

  /** One patch token per this many payload bytes (the ViT-patch /
    * audio-frame budget analogue for the stub codec's byte payloads). */
  private val PatchBytes = 32

  /** Context-window budget for interleaved sequences — matches the text
    * packer's (tx14/tx26) so the two streams' bins are comparable. */
  private val SeqBudget = Constants.PackBudget

  /** mm10: INTERLEAVED multimodal sequence packing — the batch-assembly
    * step of multimodal LLM training (LLaVA/Fuyu-style): each document
    * contributes its text tokens (the REAL BPE budget, tx24's
    * expression) followed by its media payload's patch tokens (one per
    * [[PatchBytes]] bytes — the ViT-patch count analogue, computed from
    * the bytes the scan already has; the stub codec stands in for the
    * decoder exactly as in mm2). Documents pack per source in doc_id
    * order into [[SeqBudget]]-token windows — tx26's placement algebra
    * over the COMBINED budget — and each row carries `patch_share`
    * (patch fraction of the doc's sequence footprint; the number
    * attention-cost and mixture planning read first).
    *
    * Scale posture: identical to tx26 — the encode and the patch count
    * both ride the scan (zero data movement; no decode shuffle), and
    * the ONE shuffle is the per-source ordered window. At 100 TB with
    * real media columns the patch count reads parquet column METADATA
    * (byte length), never the payload. */
  def interleavedPacking(spark: SparkSession, dir: String): DataFrame = {
    val toks = org.apache.spark.sql.GraftColumn.of(
      graft.functions.BpeEncode(
        org.apache.spark.sql.GraftColumn.expr(col("text"))))
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.load(spark, dir, "documents")
      .filter(col("text").isNotNull)
      .select(col("source"), col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast(IntegerType)).as("kind"),
        size(toks).cast(LongType).as("n_text_tokens"),
        floor((octet_length(col("text").cast(BinaryType)) + PatchBytes - 1)
          / PatchBytes).cast(LongType).as("n_patch_tokens"))
      .withColumn("n_total", col("n_text_tokens") + col("n_patch_tokens"))
      .withColumn("seq_offset", coalesce(sum(col("n_total")).over(w), lit(0L)))
      .select(col("source"), col("doc_id"), col("kind"),
        col("n_text_tokens"), col("n_patch_tokens"), col("n_total"),
        col("seq_offset"),
        TextAnalysis.startBinCol(col("seq_offset"), SeqBudget).as("start_bin"),
        TextAnalysis.endBinCol(col("seq_offset"), col("n_total"), SeqBudget)
          .as("end_bin"))
      .withColumn("crosses_boundary", col("end_bin") > col("start_bin"))
      .withColumn("patch_share",
        when(col("n_total") === 0L, lit(null).cast(DoubleType))
          .otherwise(col("n_patch_tokens").cast(DoubleType)
            / col("n_total").cast(DoubleType)))
      .orderBy(col("source"), col("doc_id"))
  }

  val interleavedPackingSql: String = TextAnalysis.bpePerDocCtes + ",\n" +
    s"""counts AS (
       |  SELECT d.source, d.doc_id,
       |    CASE (d.doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
       |      ELSE 'video' END AS kind,
       |    CAST(CASE WHEN p.ts IS NULL THEN 0
       |      ELSE len(p.ts) - len(replace(p.ts, chr(31), '')) + 1 END
       |      AS BIGINT) AS n_text_tokens,
       |    CAST((octet_length(encode(d.text)) + ${PatchBytes - 1})
       |      // $PatchBytes AS BIGINT) AS n_patch_tokens
       |  FROM documents d LEFT JOIN per p USING (doc_id)
       |  WHERE d.text IS NOT NULL),
       |o AS (
       |  SELECT *, n_text_tokens + n_patch_tokens AS n_total,
       |    COALESCE(SUM(n_text_tokens + n_patch_tokens) OVER (
       |      PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS seq_offset
       |  FROM counts)
       |SELECT source, doc_id, kind, n_text_tokens, n_patch_tokens,
       |  CAST(n_total AS BIGINT) AS n_total,
       |  CAST(seq_offset AS BIGINT) AS seq_offset,
       |  CAST(floor(seq_offset / $SeqBudget) AS BIGINT) AS start_bin,
       |  CAST(floor((seq_offset + greatest(n_total, 1) - 1) / $SeqBudget)
       |    AS BIGINT) AS end_bin,
       |  floor((seq_offset + greatest(n_total, 1) - 1) / $SeqBudget) >
       |    floor(seq_offset / $SeqBudget) AS crosses_boundary,
       |  CASE WHEN n_total = 0 THEN NULL
       |    ELSE CAST(n_patch_tokens AS DOUBLE) / CAST(n_total AS DOUBLE) END
       |    AS patch_share
       |FROM o ORDER BY source, doc_id""".stripMargin

  // -------------- mm12: REAL decoded-domain resize through the P6 codec

  /** mm12: real image RESIZE — the decoded-domain upgrade of mm4's
    * byte-truncation tier, possible now that mm11 shipped a real codec:
    * `ppm_resize_half` decodes the P6, box-downsamples the pixel plane to
    * ⌈w/2⌉×⌈h/2⌉ (each output channel byte = ⌊mean⌋ of its 2×2 input
    * block, edge blocks clamped — pure integer arithmetic in a fixed
    * traversal order), and re-encodes a minimal P6. The gate is
    * per-image and byte-exact: the twin rebuilds the input plane from
    * first principles (mm11's idiom) and recomputes every output byte in
    * the hex domain, so a single off-by-one in block geometry, rounding,
    * or the re-encoded header hash-fails. The query emits the resized
    * plane via a SECOND decode (`ppm_pixels(ppm_resize_half(content))`),
    * so decode → resize → encode → decode all sit in one scan-side
    * projection.
    *
    * Scale posture: one documents scan, everything scan-side native
    * codegen, output is the (small) resized planes themselves — payload
    * bytes never enter an exchange (the final ORDER BY ships w2·h2·3
    * bytes per image, a quarter of the input, exactly what a real
    * thumbnail stage emits). */
  def ppmResize(spark: SparkSession, dir: String): DataFrame = {
    val resized = graft.functions.TextHashFunctions.ppmResizeHalf(col("content"))
    val w = lit(8) + pmod(col("media_id"), lit(8))
    val h = lit(8) + pmod(floor(col("media_id") / 8), lit(8))
    ppmMediaTable(spark, dir)
      .select(col("media_id"),
        floor((w + 1) / 2).cast(IntegerType).as("out_w"),
        floor((h + 1) / 2).cast(IntegerType).as("out_h"),
        octet_length(resized).cast(LongType).as("file_bytes"),
        lower(hex(graft.functions.TextHashFunctions.ppmPixels(resized)))
          .as("resized_hex"))
      .orderBy(col("media_id"))
  }

  /** DuckDB oracle for mm12 (the mm11 idiom: no P6 parser in the twin —
    * the plane is rebuilt from first principles and the box average
    * recomputed per output byte in the hex-string domain). */
  val ppmResizeSql: String = {
    val hx = "'0123456789abcdef'"
    // one sampled input byte of channel c at pixel (xx, yy), in-lambda
    def at(xx: String, yy: String) =
      s"""(strpos($hx, substr(s, (($xx)*3 + ($yy)*w*3 + (k%3))*2 + 1, 1))-1)*16
         | + (strpos($hx, substr(s, (($xx)*3 + ($yy)*w*3 + (k%3))*2 + 2, 1))-1)""".stripMargin
    val x0 = "2*((k//3)%w2)"; val x1 = s"least($x0+1, w-1)"
    val y0 = "2*((k//3)//w2)"; val y1 = s"least($y0+1, h-1)"
    s"""WITH d AS (SELECT doc_id AS media_id,
       |    8 + CAST(doc_id % 8 AS INT) AS w,
       |    8 + CAST((doc_id // 8) % 8 AS INT) AS h,
       |    lower(hex(encode(text))) AS th,
       |    octet_length(encode(text)) AS nb
       |  FROM documents WHERE text IS NOT NULL AND text <> ''),
       |px AS (SELECT media_id, w, h,
       |    substr(repeat(th,
       |      CAST(floor((w*h*3 + nb - 1.0) / nb) AS INT)), 1, w*h*3*2) AS s
       |  FROM d),
       |dims AS (SELECT *, (w+1)//2 AS w2, (h+1)//2 AS h2 FROM px)
       |SELECT media_id,
       |  CAST(w2 AS INT) AS out_w,
       |  CAST(h2 AS INT) AS out_h,
       |  CAST(3 + len(CAST(w2 AS VARCHAR)) + 1 + len(CAST(h2 AS VARCHAR)) + 5
       |    + w2*h2*3 AS BIGINT) AS file_bytes,
       |  array_to_string(list_transform(
       |    list_transform(generate_series(0, w2*h2*3 - 1), k ->
       |      ((${at(x0, y0)})
       |       + CASE WHEN $x1 > $x0 THEN ${at(x1, y0)} ELSE 0 END
       |       + CASE WHEN $y1 > $y0 THEN ${at(x0, y1)} ELSE 0 END
       |       + CASE WHEN $x1 > $x0 AND $y1 > $y0 THEN ${at(x1, y1)}
       |         ELSE 0 END)
       |      // (($x1 - $x0 + 1) * ($y1 - $y0 + 1))),
       |    v -> substr($hx, v//16 + 1, 1) || substr($hx, v%16 + 1, 1)), '')
       |    AS resized_hex
       |FROM dims ORDER BY media_id""".stripMargin
  }

  // ---------- mm13: REAL frame-sampling over a concatenated-P6 stream

  /** Deterministic multi-frame P6 stream per document: `nf = 2 + id%3`
    * frames back to back (multi-image Netpbm is legal — the honest
    * frames-in-one-blob video-column shape), every frame w×h with
    * w = 8 + id%8, h = 4 + (id/8)%4, frame f's plane = bytes
    * [f·need, (f+1)·need) of the repeated doc text — consecutive slices,
    * so frames differ and the twin rebuilds each from first principles.
    * Assembled with binary-exact column ops (binary substr + an
    * `aggregate` fold of binary concat). */
  private[graft] def ppmAnimTable(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .filter(col("text").isNotNull && col("text") =!= "")
      .withColumn("nf", (lit(2) + pmod(col("doc_id"), lit(3))).cast(IntegerType))
      .withColumn("w", (lit(8) + pmod(col("doc_id"), lit(8))).cast(IntegerType))
      .withColumn("h",
        (lit(4) + pmod(floor(col("doc_id") / 8), lit(4))).cast(IntegerType))
      .withColumn("need", (col("w") * col("h") * 3).cast(IntegerType))
      .withColumn("reps",
        floor((col("nf") * col("need") + octet_length(col("text")) - 1)
          / octet_length(col("text"))).cast(IntegerType))
      .withColumn("big", expr("cast(repeat(text, reps) as binary)"))
      .select(col("doc_id").as("media_id"),
        expr("""aggregate(
                  transform(sequence(0, nf - 1), f -> concat(
                    cast(concat('P6', char(10), cast(w as string), ' ',
                                cast(h as string), char(10), '255',
                                char(10)) as binary),
                    substring(big, f * need + 1, need))),
                  cast('' as binary), (a, x) -> concat(a, x))""")
          .as("content"))

  /** mm13: real FRAME-SAMPLING — the decoded-domain upgrade of mm3's
    * byte-stride tier: `ppm_frame_planes` parses every frame of the
    * concatenated-P6 container scan-side (sequential header parses, the
    * real work of frame extraction), then the every-2nd-frame sample is
    * plain relational algebra on the exploded frames — posexplode +
    * `frame_idx % 2 = 0` — exactly how a production sampler composes
    * (decode once, sample declaratively). Gate: per sampled frame,
    * byte-exact plane hex vs the twin's first-principles slice, plus the
    * frame count per container.
    *
    * Scale posture: one scan; the container parses once per row inside
    * codegen; the only moved bytes are the SAMPLED planes (the stage's
    * actual output). Generate(posexplode) is the standard columnar
    * explode — no payload re-shuffle (ORDER BY ships sampled planes
    * only, like mm12). */
  def ppmFrameSample(spark: SparkSession, dir: String): DataFrame = {
    val planes = graft.functions.TextHashFunctions.ppmFramePlanes(col("content"))
    ppmAnimTable(spark, dir)
      .select(col("media_id"), planes.as("planes"))
      .select(col("media_id"), size(col("planes")).as("n_frames"),
        posexplode(col("planes")).as(Seq("frame_idx", "plane")))
      .filter(pmod(col("frame_idx"), lit(2)) === 0)
      .select(col("media_id"), col("n_frames"), col("frame_idx"),
        lower(hex(col("plane"))).as("plane_hex"))
      .orderBy(col("media_id"), col("frame_idx"))
  }

  /** DuckDB oracle for mm13 (mm11/mm12's idiom: no parser in the twin —
    * each sampled frame's plane is the first-principles slice of the
    * repeated text hex). */
  val ppmFrameSampleSql: String =
    """WITH d AS (SELECT doc_id AS media_id,
      |    2 + CAST(doc_id % 3 AS INT) AS nf,
      |    8 + CAST(doc_id % 8 AS INT) AS w,
      |    4 + CAST((doc_id // 8) % 4 AS INT) AS h,
      |    lower(hex(encode(text))) AS th,
      |    octet_length(encode(text)) AS nb
      |  FROM documents WHERE text IS NOT NULL AND text <> ''),
      |big AS (SELECT media_id, nf, w*h*3 AS need,
      |    repeat(th, CAST(floor((nf*w*h*3 + nb - 1.0) / nb) AS INT)) AS s
      |  FROM d),
      |frames AS (SELECT media_id, nf, need, u.f
      |  FROM big, unnest(range(0, nf)) u(f)
      |  WHERE u.f % 2 = 0)
      |SELECT b.media_id,
      |  CAST(f2.nf AS INT) AS n_frames,
      |  CAST(f2.f AS INT) AS frame_idx,
      |  substr(b.s, f2.f * f2.need * 2 + 1, f2.need * 2) AS plane_hex
      |FROM frames f2 JOIN big b USING (media_id)
      |ORDER BY media_id, frame_idx""".stripMargin

  // ------------- mm14: REAL audio features through a RIFF/WAV-PCM16 codec

  private def byteHex(v: Column): Column =
    lpad(lower(hex(pmod(v.cast(LongType), lit(256)))), 2, "0")
  private def le16Hex(v: Column): Column =
    concat(byteHex(v), byteHex(floor(v / 256)))
  private def le32Hex(v: Column): Column =
    concat(byteHex(v), byteHex(floor(v / 256)),
      byteHex(floor(v / 65536)), byteHex(floor(v / 16777216)))

  /** Four fixed PCM16LE samples prepended to every synthesized wav so
    * sign handling is really exercised: -32768, 1, -1, 127 (3 sign
    * changes, |peak| = 32768). */
  private val WavPreambleHex = "00800100ffff7f00"

  /** Deterministic canonical WAVs from the documents fixture: RIFF/WAVE
    * with `fmt ` (PCM, mono, 16-bit, rate = 8000 + (id%4)·4000 Hz), a
    * LIST/INFO metadata chunk of id-dependent size (0–4 payload bytes of
    * the constant "meta" — the unknown chunk a real parser must SKIP,
    * not hardcode offset 44 past), and a `data` chunk = the 4-sample
    * sign preamble + the doc's ASCII bytes as PCM16LE pairs. Assembled
    * entirely in the hex-string domain and `unhex`ed, so every header
    * byte (including the LE32 sizes) is column math the twin reproduces. */
  private[graft] def wavMediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .filter(col("text").isNotNull && col("text") =!= "")
      .withColumn("nb", octet_length(col("text")).cast(IntegerType))
      .withColumn("k", floor(col("nb") / 2).cast(IntegerType))
      .withColumn("rate",
        (lit(8000) + pmod(col("doc_id"), lit(4)) * 4000).cast(IntegerType))
      .withColumn("listPay", (pmod(col("doc_id"), lit(3)) * 2).cast(IntegerType))
      .withColumn("listSize", (col("listPay") + 4).cast(IntegerType))
      .withColumn("dataSize", (col("k") * 2 + 8).cast(IntegerType))
      .withColumn("riffSize",
        (col("listSize") + col("dataSize") + lit(4 + 24 + 8 + 8))
          .cast(IntegerType))
      .select(col("doc_id").as("media_id"),
        unhex(concat(
          lit("52494646"), le32Hex(col("riffSize")),          // RIFF....
          lit("57415645"),                                    // WAVE
          lit("666d7420"), le32Hex(lit(16)),                  // fmt , 16
          le16Hex(lit(1)), le16Hex(lit(1)),                   // PCM, mono
          le32Hex(col("rate")), le32Hex(col("rate") * 2),     // rate, bytes/s
          le16Hex(lit(2)), le16Hex(lit(16)),                  // align, bits
          lit("4c495354"), le32Hex(col("listSize")),          // LIST....
          lit("494e464f"),                                    // INFO
          lit("6d657461").substr(lit(1), col("listPay") * 2), // "meta" prefix
          lit("64617461"), le32Hex(col("dataSize")),          // data....
          lit(WavPreambleHex),
          lower(hex(col("text").cast(BinaryType)))
            .substr(lit(1), col("k") * 4))).as("content"))

  /** mm14: real AUDIO feature extraction — `wav_features` walks the RIFF
    * chunks (validating the container length, skipping the LIST metadata
    * chunk, honoring the odd-size pad rule, requiring PCM/mono/16-bit)
    * and folds the PCM16LE stream into the audio-curation trio: energy
    * (Σv², exact BIGINT), |peak|, and zero-crossing count — the
    * integer-exact VAD/quality signals an audio pipeline gates on. The
    * twin recomputes every feature from the text bytes and the fixed
    * preamble without parsing, so a wrong chunk walk, sign extension, or
    * sample split hash-fails.
    *
    * Scale posture: one scan, the whole parse+fold inside codegen, five
    * small columns out — payload bytes never move. */
  def wavAudioFeatures(spark: SparkSession, dir: String): DataFrame = {
    val f = org.apache.spark.sql.GraftColumn.of(
      graft.functions.WavFeatures(
        org.apache.spark.sql.GraftColumn.expr(col("content"))))
    wavMediaTable(spark, dir)
      .select(col("media_id"), f.as("f"))
      .select(col("media_id"), col("f.sample_rate"), col("f.n_samples"),
        col("f.energy"), col("f.peak_abs"), col("f.zero_crossings"))
      .orderBy(col("media_id"))
  }

  /** DuckDB oracle for mm14 (the first-principles idiom): preamble
    * features are constants (-32768, 1, -1, 127 → Σv² = 1073757955,
    * peak 32768, 3 crossings; ASCII samples are always positive so no
    * further crossings), text-sample energy recomputed per PCM16LE pair
    * in the hex domain. */
  val wavAudioFeaturesSql: String = {
    val hx = "'0123456789abcdef'"
    def nib(pos: String) = s"(strpos($hx, substr(th, $pos, 1))-1)"
    // LE pair i: lo = hex chars 4i+1..4i+2, hi = chars 4i+3..4i+4
    val v = s"(${nib("4*i+1")}*16 + ${nib("4*i+2")}" +
      s" + 256*(${nib("4*i+3")}*16 + ${nib("4*i+4")}))"
    s"""WITH d AS (SELECT doc_id AS media_id,
       |    8000 + CAST(doc_id % 4 AS INT)*4000 AS sample_rate,
       |    lower(hex(encode(text))) AS th,
       |    octet_length(encode(text)) // 2 AS k
       |  FROM documents WHERE text IS NOT NULL AND text <> '')
       |SELECT media_id,
       |  sample_rate,
       |  CAST(4 + k AS INT) AS n_samples,
       |  CAST(1073757955 + COALESCE(list_aggregate(
       |    list_transform(generate_series(0, k-1), i ->
       |      CAST($v AS BIGINT) * CAST($v AS BIGINT)), 'sum'), 0)
       |    AS BIGINT) AS energy,
       |  CAST(32768 AS INT) AS peak_abs,
       |  CAST(3 AS INT) AS zero_crossings
       |FROM d ORDER BY media_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm14_wav_features" -> wavAudioFeatures,
    "mm13_ppm_frame_sample" -> ppmFrameSample,
    "mm12_ppm_resize" -> ppmResize,
    "mm11_ppm_decoded" -> ppmDecodedNearDup,
    "mm10_interleaved_packing" -> interleavedPacking,
    "mm9_content_chunks" -> contentChunkCensus,
    "mm8_byte_entropy" -> byteEntropy,
    "mm7_chunk_dedup" -> chunkDedup,
    "mm1_binary_meta" -> binaryMeta,
    "mm2_feature_extract" -> featureExtract,
    "mm3_frame_stats" -> frameStats,
    "mm4_resize_plan" -> resizePlan,
    "mm5_phash_neardup" -> phashNearDup,
    "mm6_phash_decoded" -> phashDecodedNearDup)

  val oracle: Map[String, String] = Map(
    "mm14_wav_features" -> wavAudioFeaturesSql,
    "mm13_ppm_frame_sample" -> ppmFrameSampleSql,
    "mm12_ppm_resize" -> ppmResizeSql,
    "mm11_ppm_decoded" -> ppmDecodedNearDupSql,
    "mm10_interleaved_packing" -> interleavedPackingSql,
    "mm9_content_chunks" -> contentChunkCensusSql,
    "mm8_byte_entropy" -> byteEntropySql,
    "mm7_chunk_dedup" -> chunkDedupSql,
    "mm1_binary_meta" -> binaryMetaSql,
    "mm2_feature_extract" -> featureExtractSql,
    "mm3_frame_stats" -> frameStatsSql,
    "mm4_resize_plan" -> resizePlanSql,
    "mm5_phash_neardup" -> phashNearDupSql,
    "mm6_phash_decoded" -> phashDecodedNearDupSql)
}
