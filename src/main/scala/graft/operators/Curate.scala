package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** The end-to-end corpus-curation chain — the filter → dedup pass a
  * training corpus goes through before packing, as ONE reusable
  * operator over any (id, text) frame:
  *
  *  1. language-ID and quality scoring (pure map — [[Text.langId]],
  *     [[Text.qualityScore]], [[Text.fingerprint]]);
  *  2. keep docs with a confident language and quality >= `minQuality`
  *     — CJK exempt from the threshold (the alpha/stopword signals are
  *     latin-centric; a production pipeline scores CJK separately);
  *  3. exact dedup to the minimum-id survivor per normalized
  *     fingerprint (one hash aggregate + a co-keyed semi-join);
  *  4. near-dup dedup of the survivors: minhash → LSH bands → verified
  *     jaccard >= `minJaccard` → connected components → one anti-join.
  *
  * Returns the surviving rows with `lang_pred` and `quality_score`
  * attached (all original columns kept).
  *
  * EXECUTION SEMANTICS: checkpoint-stepped like NearDup.minhashPairs —
  * the SCORED frame is localCheckpoint'd BEFORE the filter, so the
  * regex scoring trees evaluate exactly once per row. Filtering the
  * lazy projection instead would let PushDownPredicates substitute the
  * lang_pred/quality aliases into the filter condition — four copies
  * of the scoring tree in one predicate, a generated method past
  * Janino's 64KB limit, and the whole scan stage silently interpreted
  * (measured 23.5 s vs ~4 s at sf0.1). ONLY the scored frame (and the
  * returned result) materialize: the exact-dedup survivors stay LAZY
  * and fuse into their consumers — the agg + semi-join re-run per
  * consumer over the scored checkpoint's blocks, which is far cheaper
  * than pushing a second full copy of the corpus (with its text
  * column) through the block manager (r7 verdict: the eager `exact`
  * checkpoint serialized the stages and cost ~5 s of the query's
  * 11 s at sf0.1). Every intermediate checkpoint is freed before
  * returning — ON ALL PATHS (leaked MEMORY_AND_DISK blocks degraded
  * unrelated later queries 3-7× in a full bench session); at 100 TB
  * the scored intermediate would be written to a table instead.
  *
  * The RETURNED frame is itself an eager localCheckpoint (the lineage
  * ends at blocks that outlive the internal frees). Callers that run
  * many queries in one session should call [[release]] on it once
  * done, or its corpus-sized blocks stay resident until the
  * ContextCleaner notices.
  */
object Curate {

  def curate(docs: DataFrame, idCol: String, textCol: String,
      minQuality: Double = 0.5, minJaccard: Double = 0.5): DataFrame = {
    val keep = docs.columns.toSeq
    require(!keep.contains("lang_pred") && !keep.contains("quality_score") &&
      !keep.contains("__fp"),
      "curate: input must not already carry lang_pred/quality_score/__fp")
    val t = col(textCol)
    val scored = docs.select(keep.map(col) ++ Seq(
      Text.langId(t).as("lang_pred"),
      Text.qualityScore(t).as("quality_score"),
      Text.fingerprint(t).as("__fp")): _*)
      .localCheckpoint(true)
    try {
      val filtered = scored.filter(col("lang_pred") =!= "unknown" &&
        (col("quality_score") >= minQuality || col("lang_pred") === "zh"))
      val canon = filtered.groupBy(col("__fp")).agg(min(col(idCol)).as(idCol))
      val exact = filtered.join(canon, Seq("__fp", idCol), "left_semi")
      val clusters = NearDup.dupClusters(exact, idCol, textCol, minJaccard)
      try Transform.dropNearDups(exact, clusters, idCol)
        .drop("__fp")
        .localCheckpoint(true)
      finally NearDup.freeCheckpoint(clusters)
    } finally NearDup.freeCheckpoint(scored)
  }

  /** Free the storage blocks behind a frame [[curate]] returned (or any
    * frame rooted at an eager localCheckpoint). Safe no-op on frames
    * with no checkpoint leaf. */
  def release(df: DataFrame): Unit = NearDup.freeCheckpoint(df)
}
