package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Byte-pair-encoding tokenizer TRAINING (Sennrich, Haddow & Birch 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") — the
  * classic word-level BPE: start from the character sequence of every
  * distinct word, repeatedly find the most frequent adjacent symbol pair
  * (weighted by word count) and merge its occurrences, emitting the
  * ordered merge list — the artifact a tokenizer ships.
  *
  * Scale shape: the corpus is scanned ONCE (word counts); every training
  * round then runs over the distinct-word frame — cost is O(vocabulary),
  * independent of corpus size, which is why BPE trainers survive
  * terabyte corpora. Per round: one in-row pair explode + one
  * map-side-combined count, a 1-row argmax (TakeOrderedAndProject), and
  * one broadcast of that row back over the vocab for the merge. Rounds
  * are checkpoint-stepped with the previous round freed (the kmeans/CC
  * lifecycle), so `numMerges` rounds never stack lineage.
  *
  * Determinism: pair counts are exact integers; the argmax tie-breaks on
  * the pair string; the merge is the CANONICAL left-to-right
  * non-overlapping rule, implemented as an in-row fold over the symbol
  * array ("if the accumulator ends with L and the next symbol is R,
  * fuse; else append") — merged symbols never re-participate within the
  * round because LR is strictly longer than either side. The SQL oracle
  * reaches the same fixpoint by repeatedly replacing the LEFTMOST
  * " L R " occurrence (equivalent: a fused LR can never recreate the
  * pattern), so every round lands on identical symbol sequences.
  * Symbols never contain spaces (the words come from Text.normalize's
  * [a-z0-9]+ alphabet), so the space-joined encoding is unambiguous.
  */
object Bpe {

  /** Train `numMerges` merges over the corpus `textCol`. Returns the
    * ordered merge table (merge_rank, pair, merged, pair_count) —
    * `pair` the space-separated symbol pair, `merged` its concatenation.
    * If the vocabulary exhausts its pairs early (every word fused to one
    * symbol), training stops and fewer rows return. Result is an eager
    * checkpoint; release via [[Curate.release]]. */
  def trainMerges(df: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    val (bests, w) = train(df, textCol, numMerges)
    try {
      if (bests.isEmpty) // nothing mergeable (e.g. all 1-char words)
        df.sparkSession.emptyDataFrame.select(
          lit(0L).as("merge_rank"), lit("").as("pair"),
          lit("").as("merged"), lit(0L).as("pair_count"))
      else bests.reduce(_.unionAll(_))
        .select(col("merge_rank"), col("pair"),
          call_function("replace", col("pair"), lit(" "), lit("")).as("merged"),
          col("pair_count"))
        .localCheckpoint(true)
    } finally {
      NearDup.freeCheckpoint(w)
      bests.foreach(NearDup.freeCheckpoint)
    }
  }

  /** The tokenizer's OUTPUT side: every distinct corpus word with its
    * final subword segmentation after `numMerges` trained merges —
    * (word, n_occurrences, segmentation), the space-joined symbol
    * sequence an encoder emits token ids for. Same training loop as
    * [[trainMerges]]; the lookup table this returns is what a serving
    * tokenizer caches. */
  def trainSegmentations(df: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    val (bests, w) = train(df, textCol, numMerges)
    try {
      w.select(col("__w").as("word"), col("__cnt").as("n_occurrences"),
          col("__seq").as("segmentation"))
        .localCheckpoint(true)
    } finally {
      NearDup.freeCheckpoint(w)
      bests.foreach(NearDup.freeCheckpoint)
    }
  }

  /** The shared training loop: per-round best-pair frames (1 row each,
    * checkpointed) and the final segmented vocab frame (checkpointed).
    * Callers own every returned checkpoint. */
  private def train(df: DataFrame, textCol: String,
      numMerges: Int): (Seq[DataFrame], DataFrame) = {
    require(numMerges >= 1 && numMerges <= 256,
      s"numMerges must be in 1..256, got $numMerges")
    // Par.spread: tokenize is the dense map; word counts are exact
    val words = Par.spread(df)
      .select(explode(Text.tokens(Text.normalize(col(textCol)))).as("__w"))
      .filter(length(col("__w")) > 0)
      .groupBy(col("__w")).agg(count(lit(1)).as("__cnt"))
    var w = words
      .select(col("__w"), col("__cnt"),
        trim(regexp_replace(col("__w"), "(.)", "$1 ")).as("__seq"))
      .localCheckpoint(true)
    val bests = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    try {
      var r = 0
      var exhausted = false
      while (r < numMerges && !exhausted) {
        r += 1
        val tk = split(col("__seq"), " ")
        val pairs = w.select(col("__cnt"), explode(
            when(size(tk) >= 2, transform(sequence(lit(1), size(tk) - 1),
              i => concat(element_at(tk, i), lit(" "), element_at(tk, i + 1))))
              .otherwise(array().cast("array<string>"))).as("pair"))
          .groupBy(col("pair")).agg(sum(col("__cnt")).as("pair_count"))
        val best = pairs.orderBy(col("pair_count").desc, col("pair")).limit(1)
          .withColumn("merge_rank", lit(r.toLong))
          .localCheckpoint(true)
        // every word fused to a single symbol → no pairs left anywhere:
        // stop (merging against an empty best would EMPTY the vocab);
        // the 1-row take is driver metadata, same scale as the argmax
        exhausted = best.take(1).isEmpty
        if (exhausted) NearDup.freeCheckpoint(best)
        else {
        bests += best
        val pl = element_at(split(col("pair"), " "), 1)
        val pr = element_at(split(col("pair"), " "), 2)
        // canonical LTR non-overlapping merge: fold the symbol array,
        // fusing when (acc.last, next) == (L, R); a fused LR is longer
        // than L and than R, so it can never chain into another fuse
        val folded = aggregate(split(col("__seq"), " "),
          array().cast("array<string>"),
          (acc, x) =>
            when(size(acc) > 0 && element_at(acc, -1) === pl && x === pr,
              concat(slice(acc, lit(1), size(acc) - 1), array(concat(pl, pr))))
              .otherwise(concat(acc, array(x))))
        val next = w.crossJoin(broadcast(best.select(col("pair"))))
          .select(col("__w"), col("__cnt"),
            array_join(folded, " ").as("__seq"))
          .localCheckpoint(true)
        NearDup.freeCheckpoint(w)
        w = next
        }
      }
      (bests.toSeq, w)
    } catch {
      case e: Throwable =>
        NearDup.freeCheckpoint(w)
        bests.foreach(NearDup.freeCheckpoint)
        throw e
    }
  }
}
