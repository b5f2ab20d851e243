package graft.operators

import java.util.concurrent.{Callable, ExecutionException, Executors}

import org.apache.spark.sql.{DataFrame, Dataset}

/** Parallelism helpers the optimizer cannot supply on its own — both are
  * SCALE-ADAPTIVE (identity / same-cost at production scale, a win at
  * small scale) and SEMANTICS-PRESERVING only under conditions the call
  * sites must own (documented per method).
  */
object Par {

  /** Scale-adaptive input widening. A small parquet input (one file, one
    * row group — the local/dev shape) scans as ONE task, and Spark fuses
    * the scan with everything up to the first exchange — so a CPU-dense
    * derivation (regex scoring, shingle hashing, signature votes) runs
    * single-threaded while the rest of the machine idles. When the
    * frame's physical partition count is below the session's default
    * parallelism, repartition it up; on production inputs (scan
    * partitions >= cores) this is the IDENTITY — no added shuffle, no
    * plan change.
    *
    * Round-robin repartition reorders rows across partitions, so this is
    * safe ONLY where downstream arithmetic is partitioning-invariant:
    * per-row maps, exact integer/long/string aggregates, min/max, and
    * order-pinned windows. Callers must NOT spread a frame that feeds a
    * floating-point cross-row SUM/AVG (the add order would change the
    * last bits). Every call site is oracle-gated, which is what proves
    * the invariance held. */
  def spread[T](ds: Dataset[T]): Dataset[T] = {
    val p = ds.sparkSession.sparkContext.defaultParallelism
    if (ds.rdd.getNumPartitions >= p) ds else ds.repartition(p)
  }

  /** Pin a CPU-dense exchange's width: repartition by `cols` at the
    * session's configured shuffle width so AQE's BYTE-based partition
    * coalescing does not collapse a stage whose cost is per-row compute,
    * not bytes (64-way signature votes, array-intersect verifies — a
    * few hundred KB of input, seconds of CPU). A following aggregate or
    * distinct keyed on the same columns REUSES this shuffle (no extra
    * exchange). At production scale this is exactly the exchange the
    * plan already had (shuffle.partitions-wide) minus AQE coalescing on
    * this one edge — the trade is deliberate and local to call sites
    * that measured it. */
  def wide(df: DataFrame, cols: org.apache.spark.sql.Column*): DataFrame = {
    val sess = df.sparkSession
    val n = math.max(sess.sparkContext.defaultParallelism,
      sess.sessionState.conf.numShufflePartitions)
    df.repartition(n, cols: _*)
  }

  /** Run independent thunks as CONCURRENT Spark jobs (guide §2.6: the
    * scheduler happily runs several jobs at once; actions are only
    * sequential because driver code calls them sequentially). Used for
    * independent table writes inside one atomic commit and for the
    * (postings, docs) / (codes, codebook) index write pairs — each write
    * is small and leaves most cores idle, so overlapping them removes
    * the serialized per-job latency AND the driver-side gaps (planning,
    * commit protocol) between them. Results keep task order; the first
    * failure propagates (remaining tasks are not awaited — any files
    * they wrote stay unreferenced, which the snapshot commit protocol
    * already treats as crash debris). Single-task sequences run inline
    * with zero pool cost. */
  def inParallel[A](tasks: Seq[() => A]): Seq[A] = {
    if (tasks.lengthCompare(2) < 0) return tasks.map(_())
    val pool = Executors.newFixedThreadPool(math.min(tasks.size, 4))
    try {
      val futs = tasks.map(t => pool.submit(new Callable[A] { def call(): A = t() }))
      futs.map { f =>
        try f.get()
        catch { case e: ExecutionException => throw e.getCause }
      }
    } finally pool.shutdownNow()
  }
}
