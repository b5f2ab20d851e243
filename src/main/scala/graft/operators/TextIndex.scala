package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** PERSISTED BM25 text-serving index — the inverted-index twin of the
  * vector families in [[AnnIndex]], closing the retrieval story for the
  * TEXT side of a hybrid-search stack (cf. the in-query [[Bm25.topK]],
  * which re-tokenizes the corpus per call; at 100 TB the tokenize +
  * posting derivation is paid once at ingest and every query reads only
  * its terms' postings).
  *
  * Layout:
  *  - `path`: the postings — one (term, id, tf, dl) row per distinct
  *    (doc, term), Hive-PARTITIONED BY `tb` = xxhash64(term) mod
  *    [[Buckets]]. Query terms are LITERALS at serve time, so their
  *    bucket set is computed up front and the scan statically prunes to
  *    ≤ |terms| bucket directories — a query never touches the rest of
  *    the index. (Partitioning by raw term would create a directory per
  *    vocabulary entry — millions of dirs at corpus scale; the bucket
  *    layer keeps the directory count fixed.)
  *  - `path + "_docs"`: one (id, dl) row per document — including
  *    zero-token and NULL-text docs (dl NULL), because corpus stats (N,
  *    Σdl) count every document exactly as [[Bm25.topK]] does.
  *
  * Corpus statistics (N, Σdl, per-term df) are derived LIVE from the
  * stored rows at serve time — O(docs-table) + O(pruned postings), never
  * a corpus scan — so serve-after-append is hash-identical to a full
  * rebuild by construction (no frozen-stats drift; the
  * txt_bm25_incremental gate). Scoring itself is [[Bm25.rank]] —
  * the SAME pinned-operand-order code path as the in-query operator.
  */
object TextIndex {

  /** Reserved index column names (guarded in [[postingsRows]]). */
  val TermCol = "term"
  val TfCol = "tf"
  val DlCol = "dl"
  val TbCol = "tb"

  /** Term-bucket fanout: fixed directory count for the partition layer.
    * 64 keeps per-bucket vocabulary slices large enough for fat parquet
    * files at corpus scale while a q-term query still prunes ≥ 98%. */
  val Buckets = 64

  /** The postings of a batch: one (term, id, tf, dl, tb) row per
    * distinct (doc, term). One scan, one (id, term) map-side-combinable
    * aggregate — tokenization happens exactly once per doc, here.
    * NULL-text docs tokenize to NULL and contribute no postings (they
    * still count toward N through [[docRows]]). */
  def postingsRows(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    Seq(TermCol, TfCol, DlCol, TbCol).foreach { c =>
      require(!df.columns.contains(c),
        s"input already has a column named the reserved index column '$c'") }
    tokenized(df, idCol, textCol)
      .select(col(idCol), col(DlCol), explode(col("__t")).as(TermCol))
      .groupBy(col(idCol), col(DlCol), col(TermCol))
      .agg(count(lit(1)).as(TfCol))
      .withColumn(TbCol, pmod(xxhash64(col(TermCol)), lit(Buckets.toLong)))
  }

  /** Per-doc (id, dl) rows — EVERY doc, NULL dl for NULL-text docs (they
    * count toward N, not Σdl, matching [[Bm25.topK]]'s stats row). */
  def docRows(df: DataFrame, idCol: String, textCol: String): DataFrame =
    tokenized(df, idCol, textCol).select(col(idCol), col(DlCol))

  private def tokenized(df: DataFrame, idCol: String, textCol: String): DataFrame =
    // Par.spread: the normalize/tokenize map dominates index builds and
    // would otherwise fuse into a one-task scan; it also sets the
    // checkpoint's partition count for the postings explode downstream
    Par.spread(df)
      .select(col(idCol), Text.tokens(Text.normalize(col(textCol))).as("__t"))
      .withColumn(DlCol, size(col("__t")).cast("long"))

  /** Postings + doc rows off ONE tokenized, checkpointed pass — the
    * write paths would otherwise tokenize the corpus twice (once per
    * stored table), doubling the dominant ingest cost at corpus scale.
    * Runs `use` over the two frames, then frees the checkpoint. */
  private def withIndexFrames[A](df: DataFrame, idCol: String, textCol: String)
      (use: (DataFrame, DataFrame) => A): A = {
    Seq(TermCol, TfCol, DlCol, TbCol).foreach { c =>
      require(!df.columns.contains(c),
        s"input already has a column named the reserved index column '$c'") }
    val tok = tokenized(df, idCol, textCol).localCheckpoint(true)
    try {
      val posts = tok
        .select(col(idCol), col(DlCol), explode(col("__t")).as(TermCol))
        .groupBy(col(idCol), col(DlCol), col(TermCol))
        .agg(count(lit(1)).as(TfCol))
        .withColumn(TbCol, pmod(xxhash64(col(TermCol)), lit(Buckets.toLong)))
      use(posts, tok.select(col(idCol), col(DlCol)))
    } finally NearDup.freeCheckpoint(tok)
  }

  /** Build and persist the index: postings at `path` partitioned by term
    * bucket, the per-doc length table at `path + "_docs"` — both derived
    * from ONE tokenized pass over the corpus. Overwrite = rebuild;
    * incremental growth is [[appendTextIndex]]. */
  def writeTextIndex(df: DataFrame, idCol: String, textCol: String,
      path: String): Unit =
    withIndexFrames(df, idCol, textCol) { (posts, docs) =>
      // both frames read the same materialized tokenize checkpoint —
      // independent writes, run as concurrent jobs (guide §2.6)
      Par.inParallel(Seq(
        () => posts.write.mode("overwrite").partitionBy(TbCol).parquet(path),
        () => docs.write.mode("overwrite").parquet(path + "_docs")))
    }

  /** INCREMENTAL index maintenance: append a NEW batch's postings and
    * doc rows (one tokenized pass over the batch). O(batch) — the
    * stored index is never read and its files never rewritten (asserted
    * in TextIndexSpec). Serving derives corpus stats live, so
    * serve-after-append is hash-identical to a full rebuild over the
    * union (the txt_bm25_incremental gate). */
  def appendTextIndex(batch: DataFrame, idCol: String, textCol: String,
      path: String): Unit =
    withIndexFrames(batch, idCol, textCol) { (posts, docs) =>
      Par.inParallel(Seq(
        () => posts.write.mode("append").partitionBy(TbCol).parquet(path),
        () => docs.write.mode("append").parquet(path + "_docs")))
    }

  /** Top-k BM25 served from the PERSISTED index: zero tokenization — the
    * query terms' bucket set prunes the postings scan to ≤ |terms|
    * directories, per-term df and the (N, Σdl) corpus stats collapse
    * into ONE broadcast row, and [[Bm25.rank]] scores the ≤
    * |pruned postings| candidate docs. Hash-identical to
    * [[Bm25.topK]] over the indexed corpus (the txt_bm25_persisted
    * gate shares doc_bm25's oracle). */
  def bm25Serve(spark: SparkSession, path: String, idCol: String,
      terms: Seq[String], k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25ServeFrames(spark.read.parquet(path),
      spark.read.parquet(path + "_docs"), idCol, terms, k, k1, b)

  /** The serve body over explicit (postings, docs) frames — shared by
    * the stored-index path ([[bm25Serve]]) and the base+delta follow
    * path ([[bm25ServeFollow]]), so both score through the identical
    * plan shape. */
  def bm25ServeFrames(postings: DataFrame, docs: DataFrame, idCol: String,
      terms: Seq[String], k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    Bm25.requireQuery(terms, k)
    val spark = postings.sparkSession
    import spark.implicits._
    // the terms are literals: their buckets are too — computed through
    // the SAME xxhash64 expression as the write side (one bounded
    // ≤|terms|-row collect), so the scan statically prunes to the
    // query's bucket directories
    val buckets = terms.toDF(TermCol)
      .select(pmod(xxhash64(col(TermCol)), lit(Buckets.toLong)))
      .collect().map(_.getLong(0)).distinct.toSeq
    val posts = postings
      .filter(col(TbCol).isin(buckets: _*) && col(TermCol).isin(terms: _*))
    // per-term df in ONE map-side-combined row: postings are unique on
    // (id, term), so counting rows per term counts matching docs
    val dfAgg = posts.agg(
      coalesce(sum((col(TermCol) === terms.head).cast("long")), lit(0L)).as("__df0"),
      terms.zipWithIndex.tail.map { case (t, i) =>
        coalesce(sum((col(TermCol) === t).cast("long")), lit(0L)).as(s"__df$i")
      }: _*)
    val docStats = docs.agg(count(lit(1)).as("__N"), sum(col(DlCol)).as("__sumdl"))
    val stats = docStats.crossJoin(dfAgg)
    // candidate hits: pivot the ≤|terms| postings of each doc into the
    // __tf0.. columns [[Bm25.rank]] scores
    val hits = posts.groupBy(col(idCol), col(DlCol).as("__dl"))
      .agg(
        coalesce(sum(when(col(TermCol) === terms.head, col(TfCol))), lit(0L)).as("__tf0"),
        terms.zipWithIndex.tail.map { case (t, i) =>
          coalesce(sum(when(col(TermCol) === t, col(TfCol))), lit(0L)).as(s"__tf$i")
        }: _*)
    Bm25.rank(hits, stats, idCol, terms.size, k, k1, b)
  }

  /** Top-k BM25 from a FROZEN base index + a FOLLOWING delta — the
    * [[AnnIndex.knnLshServeFollow]] discipline for text: the base is a
    * persisted index built from a snapshot version of the corpus;
    * `deltaRoot`/`deltaTable` is kept current by
    * [[graft.sources.Replica]] sync from that version on. Base postings
    * and doc rows whose id the delta TOUCHED anti-join out, the delta's
    * live docs tokenize through the SAME [[postingsRows]] derivation,
    * and the standard serve runs over the union — corpus stats derive
    * from the composed frames, so the result is hash-identical to a
    * full rebuild over the corpus's current state (the txt_bm25_follow
    * gate). Everything past the base scans is O(touched). */
  def bm25ServeFollow(spark: SparkSession, basePath: String,
      deltaRoot: String, deltaTable: String, idCol: String, textCol: String,
      terms: Seq[String], k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val (posts, docs, _, _) = textFollowResolved(spark, basePath,
      deltaRoot, deltaTable, idCol, textCol)
    bm25ServeFrames(posts, docs, idCol, terms, k, k1, b)
  }

  /** The resolved (postings, docs) of a following text index — base
    * rows minus delta-touched ids, union the delta's live docs run
    * through the build-time derivations. Shared verbatim by serve and
    * fold, so a fold persists EXACTLY the served frames. The delta
    * frames are materialized (multi-term serves re-read the checkpoint,
    * not the tokenize). Returns (postings, docs, delta checkpoints). */
  private def textFollowResolved(spark: SparkSession, basePath: String,
      deltaRoot: String, deltaTable: String, idCol: String,
      textCol: String): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    import graft.sources.Snapshot
    val basePosts = spark.read.parquet(basePath)
    val baseDocs = spark.read.parquet(basePath + "_docs")
    val live = Snapshot.read(spark, deltaRoot, deltaTable)
    val liveKeys = live.select(col(idCol))
    val touched = Snapshot.shadowedKeys(spark, deltaRoot, deltaTable) match {
      case Some(shadow) => shadow.select(col(idCol)).unionByName(liveKeys).distinct()
      case None => liveKeys.distinct()
    }
    val (deltaPosts, deltaDocs) = withIndexFrames(live, idCol, textCol) {
      (posts, docs) =>
        (posts.select(basePosts.columns.map(col).toSeq: _*).localCheckpoint(true),
          docs.select(baseDocs.columns.map(col).toSeq: _*).localCheckpoint(true))
    }
    (basePosts.join(touched, Seq(idCol), "left_anti").unionByName(deltaPosts),
      baseDocs.join(touched, Seq(idCol), "left_anti").unionByName(deltaDocs),
      deltaPosts, deltaDocs)
  }

  /** FOLD a following text index's delta into a fresh frozen base at
    * `newBasePath` — writes the EXACT resolved frames the follow mode
    * serves (stored postings pass through untouched, only the delta's
    * live docs tokenize; the corpus is never re-read), partitioned by
    * term bucket like any [[writeTextIndex]] base. O(base + delta).
    * Returns the handoff cursor under the same contract and concurrency
    * check as [[AnnIndex.compactLshFollow]]: a never-synced delta
    * throws, a sync landing mid-fold fails loudly (the old base+delta
    * pair kept serving — re-run). */
  def compactTextFollow(spark: SparkSession, basePath: String,
      deltaRoot: String, deltaTable: String, idCol: String, textCol: String,
      newBasePath: String): Long = {
    val cur = AnnIndex.foldCursor(spark, deltaRoot, "compactTextFollow")
    val (posts, docs, deltaPosts, deltaDocs) = textFollowResolved(spark,
      basePath, deltaRoot, deltaTable, idCol, textCol)
    try {
      Par.inParallel(Seq(
        () => posts.write.mode("overwrite").partitionBy(TbCol).parquet(newBasePath),
        () => docs.write.mode("overwrite").parquet(newBasePath + "_docs")))
    } finally {
      NearDup.freeCheckpoint(deltaPosts)
      NearDup.freeCheckpoint(deltaDocs)
    }
    AnnIndex.requireCursorStable(spark, deltaRoot, cur, "compactTextFollow")
    cur
  }
}
