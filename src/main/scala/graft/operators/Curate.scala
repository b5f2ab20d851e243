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
    // Par.spread BEFORE the scoring projection: the lang/quality regex
    // trees are the dense map and would otherwise fuse into a one-task
    // scan (identity on production inputs; gates below are exact)
    val scored = Par.spread(docs).select(keep.map(col) ++ Seq(
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

  /** CURATION v2 — the modern CCNet/DSIR-shaped pipeline composed from
    * the TRAINED components (the heuristic chain of [[curate]] upgraded
    * model-by-model):
    *
    *  1. TRAINED language-ID ([[LangProfile.classify]], Cavnar-Trenkle
    *     rank profiles learned from the labeled corpus): keep docs whose
    *     predicted language is in `keepLangs` (docs too short to carry a
    *     trigram are dropped — nothing to classify);
    *  2. heuristic quality floor (`Text.qualityScore >= minQuality` —
    *     NOTE: the score's alpha/stopword features are latin-centric, so
    *     a CJK entry in `keepLangs` wants its own threshold);
    *  3. LM quality gate ([[LangModel.unigramNll]] trained once on the
    *     full corpus's `langCol == 'en'` slice — the fixed reference
    *     model): keep docs with average NLL <= `maxAvgNllMicro`
    *     micro-nats/token, compared CROSS-MULTIPLIED in exact integers
    *     (`nll_micro <= maxAvgNllMicro · n_tokens` — no division);
    *     docs with an empty normalized token stream have no score and
    *     pass (nothing to judge);
    *  4. exact dedup (minimum-id survivor per normalized fingerprint);
    *  5. near-dup dedup (minhash → LSH bands → verified jaccard >=
    *     `minJaccard` → connected components → anti-join);
    *  6. DSIR importance resampling ([[Dsir.resample]] over the
    *     SURVIVORS — both its LMs train on the curated set): the
    *     `dsirK` winners of the deterministic salted-Gumbel draw are
    *     the final training mix, sampled ∝ softmax(importance ratio).
    *
    * Returns (idCol, lang_pred, quality_score, n_tokens, lr_micro,
    * key_micro, rank) — rank 1..dsirK in selection order. Same
    * checkpoint discipline as [[curate]] (scored frame materialized
    * once, intermediates freed on all paths, result released via
    * [[release]]); every stage is engine-exact, so the whole
    * composition gates against a DuckDB oracle that chains the
    * doc_lang_trained / doc_lm_score / doc_dsir CTE blocks. */
  def curateV2(docs: DataFrame, idCol: String, textCol: String, langCol: String,
      dsirTargetPred: org.apache.spark.sql.Column, dsirK: Int,
      keepLangs: Seq[String] = Seq("en", "es", "de", "fr"),
      minQuality: Double = 0.5,
      maxAvgNllMicro: Long = 3410000L,
      minJaccard: Double = 0.5): DataFrame = {
    val keep = docs.columns.toSeq
    Seq("lang_pred", "quality_score", "n_tokens", "nll_micro", "__fp").foreach { c =>
      require(!keep.contains(c), s"curateV2: input must not already carry '$c'") }
    // ONE shared corpus scan for every token-consuming stage: the word
    // tokens (LM gate + DSIR) and char trigrams (language-ID) both
    // derive from the same pass over the text column and checkpoint
    // together — without this, classify / unigramNll / DSIR each
    // re-scan + re-tokenize the corpus (three full normalize+split
    // passes, measured ~4+1.5+2 s of the r9 query's 16 s at sf0.1).
    // The array expressions are byte-for-byte the ones the standalone
    // operators build, so every stage's result is bit-identical to its
    // standalone gated query. At 100 TB this intermediate would be
    // written to a table instead (the `scored` note below).
    // spread once at entry: the shared tokenize/trigram scan AND the
    // scored-frame quality/fingerprint regexes are the dense maps; the
    // spread also sets the shared CHECKPOINT's partition count, so every
    // downstream token consumer (LM, classifier, DSIR, minhash) reads it
    // parallel instead of inheriting a one-task scan's single block
    val docsS = Par.spread(docs)
    val shared = docsS
      .select(col(idCol), col(langCol),
        split(lower(col(textCol)), "").as("__ch"),
        Text.tokens(Text.normalize(coalesce(col(textCol), lit("")))).as("__toks"))
      .select(col(idCol), col(langCol), col("__toks"),
        LangProfile.charTrigrams(col("__ch")).as("__grams"))
      .localCheckpoint(true)
    val pred = LangProfile.classifyFromArrays(
      shared.select(col(idCol), col(langCol).as("lang"), col("__grams")), idCol)
    val lm = LangModel.unigramNllFromTokens(shared, idCol, col(langCol) === "en")
    try {
      val scored = docsS
        .join(pred.select(col(idCol), col("lang_pred")), Seq(idCol))
        .join(lm.select(col(idCol), col("n_tokens"), col("nll_micro")),
          Seq(idCol), "left_outer")
        .withColumn("quality_score", Text.qualityScore(col(textCol)))
        .withColumn("__fp", Text.fingerprint(col(textCol)))
        .localCheckpoint(true)
      try {
        val filtered = scored
          .filter(col("lang_pred").isin(keepLangs: _*))
          .filter(col("quality_score") >= minQuality)
          .filter(col("nll_micro").isNull ||
            col("nll_micro") <= lit(maxAvgNllMicro) * col("n_tokens"))
        val canon = filtered.groupBy(col("__fp")).agg(min(col(idCol)).as(idCol))
        val exact = filtered.join(canon, Seq("__fp", idCol), "left_semi")
        // near-dup dedup ALSO reads the shared token arrays (the same
        // equi-join restriction DSIR uses below): minhash shingles are
        // word-token 3-grams, so this absorbs the one normalize+split
        // text pass the shared frame had not yet covered — shingle
        // arrays element-identical, pairs/clusters bit-identical
        // (oracle-locked).
        val clusters = NearDup.dupClustersFromTokens(
          shared.select(col(idCol), col("__toks"))
            .join(exact.select(col(idCol)), Seq(idCol)),
          idCol, minJaccard)
        val surv =
          try Transform.dropNearDups(exact, clusters, idCol)
            .drop("__fp", "n_tokens", "nll_micro")
            .localCheckpoint(true)
          finally NearDup.freeCheckpoint(clusters)
        try {
          // DSIR re-reads the SHARED token arrays restricted to the
          // survivors (an equi-join of the small (id, target-flag)
          // survivor frame onto the checkpointed arrays — AQE broadcasts
          // the survivor side at these sizes) instead of re-tokenizing;
          // tokens per id are identical, so the draw is bit-identical.
          val survToks = surv.select(col(idCol), dsirTargetPred.as("__tgt"))
            .join(shared.select(col(idCol), col("__toks")), Seq(idCol))
          val picked = Dsir.resampleFromTokens(survToks, idCol, col("__tgt"), dsirK)
          try {
            picked
              .join(surv.select(col(idCol), col("lang_pred"), col("quality_score")),
                Seq(idCol))
              .select(col(idCol), col("lang_pred"), col("quality_score"),
                col("n_tokens"), col("lr_micro"), col("key_micro"), col("rank"))
              .localCheckpoint(true)
          } finally release(picked)
        } finally NearDup.freeCheckpoint(surv)
      } finally NearDup.freeCheckpoint(scored)
    } finally { release(pred); release(lm); NearDup.freeCheckpoint(shared) }
  }

  /** CURATION v3 — [[curateV2]] with its one remaining HEURISTIC gate
    * upgraded to the third trained model: the hand-tuned
    * `Text.qualityScore >= minQuality` floor is replaced by the
    * TRAINED discriminative classifier ([[QualityClassifier]], the
    * GPT-3 §A recipe verbatim — "a classifier to distinguish
    * [high-quality reference] from raw Common Crawl", trained
    * reference-slice-vs-raw over the UNFILTERED corpus, docs kept by
    * positive margin). Every gate is now learned from the data:
    *
    *  1. TRAINED language-ID (keep `keepLangs`);
    *  2. TRAINED quality gate: perceptron margin > 0 against the
    *     reference slice `dsirTargetPred` — the same slice DSIR
    *     targets, GPT-3's WebText-vs-crawl split re-expressed;
    *  3. LM quality gate (unigram NLL, integer cross-multiplied);
    *  4. exact dedup; 5. near-dup dedup; 6. DSIR resampling —
    *  all stage-for-stage [[curateV2]].
    *
    * The classifier trains and scores FROM THE SHARED TOKEN SCAN
    * ([[QualityClassifier.trainFromTokens]] / `scoreFromTokens` — the
    * corpus text is read once for all four token consumers), so the
    * margin per doc is bit-identical to the standalone
    * doc_quality_classifier gate's and the whole composition
    * oracle-gates. Returns (idCol, lang_pred, margin, n_tokens,
    * lr_micro, key_micro, rank) — `margin` replacing v2's heuristic
    * `quality_score`. Same checkpoint discipline as [[curateV2]]. */
  def curateV3(docs: DataFrame, idCol: String, textCol: String, langCol: String,
      dsirTargetPred: org.apache.spark.sql.Column, dsirK: Int,
      keepLangs: Seq[String] = Seq("en", "es", "de", "fr"),
      maxAvgNllMicro: Long = 3410000L,
      minJaccard: Double = 0.5,
      clsIters: Int = 4, clsFeatures: Int = 64,
      clsMedianCut: Boolean = false): DataFrame = {
    val keep = docs.columns.toSeq
    Seq("lang_pred", "margin", "n_tokens", "nll_micro", "__fp").foreach { c =>
      require(!keep.contains(c), s"curateV3: input must not already carry '$c'") }
    // spread once at entry (see [[curateV2]])
    val docsS = Par.spread(docs)
    val shared = docsS
      .select(col(idCol), col(langCol), dsirTargetPred.as("__tgt"),
        split(lower(col(textCol)), "").as("__ch"),
        Text.tokens(Text.normalize(coalesce(col(textCol), lit("")))).as("__toks"))
      .select(col(idCol), col(langCol), col("__tgt"), col("__toks"),
        LangProfile.charTrigrams(col("__ch")).as("__grams"))
      .localCheckpoint(true)
    val pred = LangProfile.classifyFromArrays(
      shared.select(col(idCol), col(langCol).as("lang"), col("__grams")), idCol)
    val lm = LangModel.unigramNllFromTokens(shared, idCol, col(langCol) === "en")
    // the trained quality gate: reference slice vs the RAW corpus —
    // trained before any other gate touches the data (the GPT-3 split)
    val wts = QualityClassifier.trainFromTokens(shared, idCol, "__toks",
      col("__tgt"), iters = clsIters, numFeatures = clsFeatures)
    try {
      val margins = QualityClassifier.scoreFromTokens(wts, shared, idCol,
        "__toks", numFeatures = clsFeatures)
        .select(col(idCol), col("margin"))
      // The trained-quality cut. `clsMedianCut = false` keeps margin > 0
      // (the GPT-3 recipe's natural zero for a separable reference
      // slice). When the reference labels don't separate the corpus
      // textually (e.g. a synthetic corpus whose slices share one token
      // pool), the full-batch perceptron's margins move as a BLOCK —
      // the common component dominates the between-class signal, so
      // margin > 0 keeps everything or nothing depending on which side
      // of the oscillation the final round lands. `clsMedianCut = true`
      // CALIBRATES the cut at the corpus-median margin instead (the
      // GPT-3 report's "threshold chosen to hit a keep rate" made
      // deterministic): exact `percentile` over integer margins — a
      // dyadic midpoint at even counts, bit-identical cross-engine —
      // keeps the strictly-above-median half at any scale.
      val cut: org.apache.spark.sql.Column =
        if (clsMedianCut) {
          // one-row bounded collect (the k-means codebook discipline);
          // an empty corpus has no median — fall back to the zero cut
          val r = margins.agg(expr("percentile(margin, 0.5D)").as("__mcut")).head()
          lit(if (r.isNullAt(0)) 0.0 else r.getDouble(0))
        } else lit(0L).cast("double")
      val scored = docsS
        .join(pred.select(col(idCol), col("lang_pred")), Seq(idCol))
        .join(lm.select(col(idCol), col("n_tokens"), col("nll_micro")),
          Seq(idCol), "left_outer")
        .join(margins, Seq(idCol))
        .withColumn("__fp", Text.fingerprint(col(textCol)))
        .localCheckpoint(true)
      try {
        val filtered = scored
          .filter(col("lang_pred").isin(keepLangs: _*))
          .filter(col("margin") > cut)
          .filter(col("nll_micro").isNull ||
            col("nll_micro") <= lit(maxAvgNllMicro) * col("n_tokens"))
        val canon = filtered.groupBy(col("__fp")).agg(min(col(idCol)).as(idCol))
        val exact = filtered.join(canon, Seq("__fp", idCol), "left_semi")
        // near-dup dedup from the shared token arrays (see curateV2)
        val clusters = NearDup.dupClustersFromTokens(
          shared.select(col(idCol), col("__toks"))
            .join(exact.select(col(idCol)), Seq(idCol)),
          idCol, minJaccard)
        val surv =
          try Transform.dropNearDups(exact, clusters, idCol)
            .drop("__fp", "n_tokens", "nll_micro")
            .localCheckpoint(true)
          finally NearDup.freeCheckpoint(clusters)
        try {
          val survToks = surv.select(col(idCol), dsirTargetPred.as("__tgt"))
            .join(shared.select(col(idCol), col("__toks")), Seq(idCol))
          val picked = Dsir.resampleFromTokens(survToks, idCol, col("__tgt"), dsirK)
          try {
            picked
              .join(surv.select(col(idCol), col("lang_pred"), col("margin")),
                Seq(idCol))
              .select(col(idCol), col("lang_pred"), col("margin"),
                col("n_tokens"), col("lr_micro"), col("key_micro"), col("rank"))
              .localCheckpoint(true)
          } finally release(picked)
        } finally NearDup.freeCheckpoint(surv)
      } finally NearDup.freeCheckpoint(scored)
    } finally { release(pred); release(lm); NearDup.freeCheckpoint(shared) }
  }

  /** INCREMENTAL curation — [[curateV2]]'s gates applied to a DELTA
    * with every model FROZEN, the shape a continuously-ingesting
    * 100 TB corpus actually runs: models train once at corpus-build
    * time ([[LangProfile.profiles]], [[LangModel.train]],
    * [[DedupState.stateOf]] — all persisted tables), and each arriving
    * batch is curated against those artifacts at O(batch + state) —
    * the corpus text is NEVER re-read, re-tokenized, or re-modeled.
    *
    *  1. frozen language-ID ([[LangProfile.classifyWith]] against the
    *     persisted `profiles`): keep `keepLangs`, unscorable short docs
    *     drop;
    *  2. heuristic quality floor (`Text.qualityScore >= minQuality`);
    *  3. frozen LM gate ([[LangModel.scoreWith]] against the persisted
    *     `lm` vocab — the CCNet fixed-reference-model contract: every
    *     batch judged by the SAME yardstick, integer cross-multiplied);
    *  4. batch-internal exact dedup (min-id survivor per fingerprint)
    *     then batch-internal near-dup dedup (the [[curateV2]] LSH →
    *     verify → CC → anti-join chain — a delta can contain its own
    *     duplicates);
    *  5. corpus dedup against the PERSISTED signature state
    *     ([[DedupState.dedupeAgainstState]]): survivors are neither
    *     exact nor near duplicates of anything already absorbed.
    *
    * Returns the surviving batch rows with `lang_pred`/`quality_score`
    * attached AND their own fp/sh/sig state columns retained, so the
    * caller absorbs them into the state table without recomputing
    * anything (drop [[DedupState.StateCols]] if unwanted). Gate
    * arithmetic is stage-for-stage the [[curateV2]] trees, so the
    * composition oracle-gates (doc_curate_incremental) and a batch
    * curated here equals the same docs curated by a [[curateV2]] whose
    * training slices were the frozen artifacts' sources. Same
    * checkpoint discipline: the shared token/trigram scan and the
    * scored frame materialize once each and are freed on all paths;
    * the result is an eager checkpoint ([[release]] when done). */
  def curateDelta(profiles: DataFrame, lm: DataFrame, state: DataFrame,
      batch: DataFrame, idCol: String, textCol: String,
      keepLangs: Seq[String] = Seq("en", "es", "de", "fr"),
      minQuality: Double = 0.5,
      maxAvgNllMicro: Long = 3410000L,
      minJaccard: Double = 0.5): DataFrame = {
    val keep = batch.columns.toSeq
    (Seq("lang_pred", "quality_score", "n_tokens", "nll_micro", "__fp") ++
      DedupState.StateCols).foreach { c =>
      require(!keep.contains(c), s"curateDelta: input must not already carry '$c'") }
    // spread once at entry (see [[curateV2]])
    val batchS = Par.spread(batch)
    val shared = batchS
      .select(col(idCol),
        split(lower(col(textCol)), "").as("__ch"),
        Text.tokens(Text.normalize(coalesce(col(textCol), lit("")))).as("__toks"))
      .select(col(idCol), col("__toks"),
        LangProfile.charTrigrams(col("__ch")).as("__grams"))
      .localCheckpoint(true)
    try {
      val pred = LangProfile.classifyWithFromArrays(profiles,
        shared.select(col(idCol), col("__grams")), idCol)
      val lmScores = LangModel.scoreWithFromTokens(lm,
        shared.select(col(idCol), col("__toks")), idCol)
      val scored = batchS
        .join(pred.select(col(idCol), col("lang_pred")), Seq(idCol))
        .join(lmScores.select(col(idCol), col("n_tokens"), col("nll_micro")),
          Seq(idCol), "left_outer")
        .withColumn("quality_score", Text.qualityScore(col(textCol)))
        .withColumn("__fp", Text.fingerprint(col(textCol)))
        .localCheckpoint(true)
      try {
        val filtered = scored
          .filter(col("lang_pred").isin(keepLangs: _*))
          .filter(col("quality_score") >= minQuality)
          .filter(col("nll_micro").isNull ||
            col("nll_micro") <= lit(maxAvgNllMicro) * col("n_tokens"))
        val canon = filtered.groupBy(col("__fp")).agg(min(col(idCol)).as(idCol))
        val exact = filtered.join(canon, Seq("__fp", idCol), "left_semi")
        val clusters = NearDup.dupClusters(exact, idCol, textCol, minJaccard)
        // batch survivors stay LAZY into dedupeAgainstState (it scans
        // its batch input exactly once, into its own persisted frame);
        // clusters' blocks must outlive that evaluation — freed only
        // after dedupeAgainstState's eager-checkpoint result exists
        try {
          val surv = Transform.dropNearDups(exact, clusters, idCol)
            .drop("__fp", "n_tokens", "nll_micro")
          DedupState.dedupeAgainstState(state, surv, idCol, textCol, minJaccard)
        } finally NearDup.freeCheckpoint(clusters)
      } finally NearDup.freeCheckpoint(scored)
    } finally NearDup.freeCheckpoint(shared)
  }

  /** Free the storage blocks behind a frame [[curate]] returned (or any
    * frame rooted at an eager localCheckpoint). Safe no-op on frames
    * with no checkpoint leaf. */
  def release(df: DataFrame): Unit = NearDup.freeCheckpoint(df)
}
