package graft

import java.io.IOException
import java.nio.file.Files

import org.apache.hadoop.fs.Path

import graft.operators.Upsert

/** The parquet-table swap must never destroy the only copy of the data:
  * every rename is checked and failure paths roll back (round-2 verdict
  * "What's wrong #2" — the old java.io.File version ignored every
  * renameTo result and then deleted the backup). */
class UpsertSwapSpec extends SparkSpec {
  import sqlImplicits._

  private def fs = new Path("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("upsertParquet round-trip: create, merge, idempotent re-merge") {
    val table = Files.createTempDirectory("graft-swap").toString + "/t"
    val s1 = Seq((1, "a"), (2, "b")).toDF("k", "v")
    // per-branch MERGE telemetry: (inserted, updated, total) per call
    assert(Upsert.upsertParquet(spark, table, s1, Seq("k")) == Upsert.MergeStats(2, 0, 2))
    val s2 = Seq((2, "B"), (3, "C")).toDF("k", "v")
    assert(Upsert.upsertParquet(spark, table, s2, Seq("k")) == Upsert.MergeStats(1, 1, 3))
    assert(Upsert.upsertParquet(spark, table, s2, Seq("k")) == Upsert.MergeStats(0, 2, 3))
    val got = spark.read.parquet(table).orderBy("k")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(got == Seq((1, "a"), (2, "B"), (3, "C")))
    // no stray swap artifacts left behind
    assert(!fs.exists(new Path(table + ".tmp")) && !fs.exists(new Path(table + ".old")))
  }

  test("swap with missing staged data throws and leaves the live table intact") {
    val dir = Files.createTempDirectory("graft-swap2").toString
    val table = dir + "/t"
    Seq((1, "keep")).toDF("k", "v").write.parquet(table)
    val ex = intercept[IOException] {
      Upsert.swapInto(fs, new Path(dir + "/nonexistent.tmp"), new Path(table))
    }
    assert(ex.getMessage.contains("table untouched"))
    val got = spark.read.parquet(table).collect()
    assert(got.length == 1 && got.head.getString(1) == "keep")
  }

  test("swap installs fresh data when no live table exists") {
    val dir = Files.createTempDirectory("graft-swap3").toString
    val tmp = dir + "/t.tmp"
    Seq((7, "new")).toDF("k", "v").write.parquet(tmp)
    Upsert.swapInto(fs, new Path(tmp), new Path(dir + "/t"))
    assert(spark.read.parquet(dir + "/t").count() == 1L)
    assert(!fs.exists(new Path(tmp)))
  }

  test("duplicate stage keys fail loudly instead of skewing MERGE stats") {
    val table = Files.createTempDirectory("graft-dup").toString + "/t"
    val dup = Seq((1, "a"), (1, "b")).toDF("k", "v")
    val ex = intercept[IllegalArgumentException] {
      Upsert.upsertParquet(spark, table, dup, Seq("k"))
    }
    assert(ex.getMessage.contains("unique"))
  }

  /** Per-file (path, length, checksum) of every data file under each
    * bucket directory — the identity evidence for the no-rewrite claim. */
  private def bucketFiles(table: String, bucket: Int): Seq[(String, Long, String)] = {
    val dir = new Path(s"$table/${Upsert.BucketCol}=$bucket")
    fs.listStatus(dir).filter(_.isFile).map { st =>
      val in = fs.open(st.getPath)
      val bytes = new Array[Byte](st.getLen.toInt)
      in.readFully(bytes); in.close()
      (st.getPath.getName, st.getLen,
        java.security.MessageDigest.getInstance("MD5").digest(bytes).map("%02x".format(_)).mkString)
    }.toSeq.sortBy(_._1)
  }

  test("bucketed merge rewrites only touched buckets; untouched files byte-identical") {
    val table = Files.createTempDirectory("graft-bkt").toString + "/t"
    val nBuckets = 8
    val s1 = (1 to 40).map(k => (k, s"v$k")).toDF("k", "v")
    assert(Upsert.upsertParquetBucketed(spark, table, s1, Seq("k"), nBuckets) ==
      Upsert.MergeStats(40, 0, 40))

    // which bucket does k=1 land in? (same function the layout uses)
    val touchedBucket = Seq(Tuple1(1)).toDF("k")
      .select(Upsert.bucketOf(Seq("k"), nBuckets)).head().getInt(0)
    val allBuckets = (0 until nBuckets).filter(b => fs.exists(
      new Path(s"$table/${Upsert.BucketCol}=$b")))
    assert(allBuckets.size > 1, "test needs >1 populated bucket to be meaningful")
    val beforeFiles = allBuckets.map(b => b -> bucketFiles(table, b)).toMap

    // merge touching exactly one key → exactly one bucket
    val s2 = Seq((1, "UPDATED")).toDF("k", "v")
    assert(Upsert.upsertParquetBucketed(spark, table, s2, Seq("k"), nBuckets) ==
      Upsert.MergeStats(0, 1, 40))

    allBuckets.filterNot(_ == touchedBucket).foreach { b =>
      assert(bucketFiles(table, b) == beforeFiles(b),
        s"untouched bucket $b was rewritten")
    }
    assert(bucketFiles(table, touchedBucket) != beforeFiles(touchedBucket),
      "touched bucket should have new files")

    // correctness of the merged content, layout column hidden
    val got = Upsert.readBucketed(spark, table)
    assert(!got.columns.contains(Upsert.BucketCol))
    val rows = got.collect().map(r => r.getAs[Int]("k") -> r.getAs[String]("v")).toMap
    assert(rows.size == 40 && rows(1) == "UPDATED" && rows(2) == "v2")

    // insert-only merge into a brand-new key: stats and content stay exact
    val s3 = Seq((41, "fresh")).toDF("k", "v")
    assert(Upsert.upsertParquetBucketed(spark, table, s3, Seq("k"), nBuckets) ==
      Upsert.MergeStats(1, 0, 41))
    // no stray swap artifacts
    assert(!fs.exists(new Path(table + ".tmp")) && !fs.exists(new Path(table + ".bak")))
  }

  test("applyCdc: matched deletes drop, absent-key deletes no-op, upserts merge") {
    val target = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
    val changes = Seq(
      (2, "B", "upsert"),   // update
      (4, "D", "upsert"),   // insert
      (3, null, "delete"),  // matched delete
      (9, null, "delete"),  // delete of absent key: no-op
    ).toDF("k", "v", "op")
    val got = Upsert.applyCdc(target, changes, Seq("k"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got == Map(1 -> "a", 2 -> "B", 4 -> "D"))
    // idempotent: replaying the batch onto its own output is a no-op
    val replay = Upsert.applyCdc(Upsert.applyCdc(target, changes, Seq("k")), changes, Seq("k"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(replay == got)
  }

  test("applyCdc: unknown op raises during the apply pass (lazy validation)") {
    val target = Seq((1, "a")).toDF("k", "v")
    val changes = Seq((2, "x", "truncate")).toDF("k", "v", "op")
    val plan = Upsert.applyCdc(target, changes, Seq("k"))  // no eager scan, no error yet
    val ex = intercept[Exception] { plan.collect() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("unknown op")), s"got: ${messages(ex)}")
  }

  test("bucketed CDC: deletes + upserts rewrite only touched buckets; replay-safe") {
    val table = Files.createTempDirectory("graft-cdc").toString + "/t"
    val nBuckets = 8
    val s1 = (1 to 40).map(k => (k, s"v$k", "upsert")).toDF("k", "v", "op")
    assert(Upsert.applyCdcParquetBucketed(spark, table, s1, Seq("k"), nBuckets) ==
      Upsert.CdcStats(40, 0, 40))

    val allBuckets = (0 until nBuckets).filter(b => fs.exists(
      new Path(s"$table/${Upsert.BucketCol}=$b")))
    val beforeFiles = allBuckets.map(b => b -> bucketFiles(table, b)).toMap

    // mixed batch: update k=1 and k=7, delete k=2, delete absent k=99
    val batch = Seq((1, "UPDATED", "upsert"), (2, null, "delete"),
      (99, null, "delete"), (7, "SEVEN", "upsert")).toDF("k", "v", "op")
    val batchBuckets = Seq(1, 2, 99, 7).toDF("k")
      .select(Upsert.bucketOf(Seq("k"), nBuckets)).collect().map(_.getInt(0)).toSet
    assert(Upsert.applyCdcParquetBucketed(spark, table, batch, Seq("k"), nBuckets) ==
      Upsert.CdcStats(2, 1, 39))

    allBuckets.filterNot(batchBuckets.contains).foreach { b =>
      assert(bucketFiles(table, b) == beforeFiles(b), s"untouched bucket $b was rewritten")
    }
    val rows = Upsert.readBucketed(spark, table)
      .collect().map(r => r.getAs[Int]("k") -> r.getAs[String]("v")).toMap
    assert(rows.size == 39 && rows(1) == "UPDATED" && rows(7) == "SEVEN"
      && !rows.contains(2) && rows(3) == "v3")

    // replay the same batch: deletes no-op, upserts converge → same content
    assert(Upsert.applyCdcParquetBucketed(spark, table, batch, Seq("k"), nBuckets) ==
      Upsert.CdcStats(2, 0, 39))
    val replayed = Upsert.readBucketed(spark, table)
      .collect().map(r => r.getAs[Int]("k") -> r.getAs[String]("v")).toMap
    assert(replayed == rows)
    assert(!fs.exists(new Path(table + ".tmp")) && !fs.exists(new Path(table + ".bak")))
  }

  test("bucketed CDC: a fully-deleted bucket's directory is retired") {
    val table = Files.createTempDirectory("graft-cdc2").toString + "/t"
    // 2 buckets; keys 1..6 split across them
    val s1 = (1 to 6).map(k => (k, s"v$k", "upsert")).toDF("k", "v", "op")
    Upsert.applyCdcParquetBucketed(spark, table, s1, Seq("k"), nBuckets = 2)
    val b0Keys = (1 to 6).filter { k =>
      Seq(k).toDF("k").select(Upsert.bucketOf(Seq("k"), 2)).head().getInt(0) == 0
    }
    assert(b0Keys.nonEmpty, "bucket 0 must hold at least one key")
    val wipe = b0Keys.map(k => (k, null: String, "delete")).toDF("k", "v", "op")
    val stats = Upsert.applyCdcParquetBucketed(spark, table, wipe, Seq("k"), 2)
    assert(stats == Upsert.CdcStats(0, b0Keys.size.toLong, (6 - b0Keys.size).toLong))
    assert(!fs.exists(new Path(s"$table/${Upsert.BucketCol}=0")),
      "emptied bucket directory should be retired")
    val rows = Upsert.readBucketed(spark, table).collect().map(_.getAs[Int]("k")).toSet
    assert(rows == (1 to 6).filterNot(b0Keys.contains).toSet)
  }

  test("bucketed merge is idempotent per key (replay-safe)") {
    val table = Files.createTempDirectory("graft-bkt2").toString + "/t"
    val s1 = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
    Upsert.upsertParquetBucketed(spark, table, s1, Seq("k"), nBuckets = 4)
    val s2 = Seq((2, "B"), (4, "D")).toDF("k", "v")
    assert(Upsert.upsertParquetBucketed(spark, table, s2, Seq("k"), 4) ==
      Upsert.MergeStats(1, 1, 4))
    assert(Upsert.upsertParquetBucketed(spark, table, s2, Seq("k"), 4) ==
      Upsert.MergeStats(0, 2, 4))
    val rows = Upsert.readBucketed(spark, table)
      .collect().map(r => r.getAs[Int]("k") -> r.getAs[String]("v")).toMap
    assert(rows == Map(1 -> "a", 2 -> "B", 3 -> "c", 4 -> "D"))
  }

  test("bucketed CDC: a fully-emptied table accepts the next batch (no wedge)") {
    val table = java.nio.file.Files.createTempDirectory("graft-cdc-empty").toString + "/t"
    val b1 = Seq((1, "a", "upsert"), (2, "b", "upsert")).toDF("k", "v", "op")
    Upsert.applyCdcParquetBucketed(spark, table, b1, Seq("k"), nBuckets = 4)
    // batch 2 deletes EVERY remaining row: all bucket dirs retire
    val b2 = Seq((1, "", "delete"), (2, "", "delete")).toDF("k", "v", "op")
    val s2 = Upsert.applyCdcParquetBucketed(spark, table, b2, Seq("k"), nBuckets = 4)
    assert(s2.deleted == 2L && s2.total == 0L)
    // batch 3 must re-seed the empty shell, not crash on schema inference
    val b3 = Seq((5, "e", "upsert"), (6, "", "delete")).toDF("k", "v", "op")
    val s3 = Upsert.applyCdcParquetBucketed(spark, table, b3, Seq("k"), nBuckets = 4)
    assert(s3.total == 1L)
    assert(Upsert.readBucketed(spark, table)
      .collect().map(r => r.getAs[Int]("k") -> r.getAs[String]("v")).toMap == Map(5 -> "e"))
    // a first batch of ONLY deletes on a brand-new path also no-ops cleanly
    val fresh = java.nio.file.Files.createTempDirectory("graft-cdc-del1").toString + "/t"
    val s0 = Upsert.applyCdcParquetBucketed(spark, fresh,
      Seq((9, "", "delete")).toDF("k", "v", "op"), Seq("k"), nBuckets = 4)
    assert(s0.total == 0L)
    assert(Upsert.applyCdcParquetBucketed(spark, fresh,
      Seq((7, "g", "upsert")).toDF("k", "v", "op"), Seq("k"), nBuckets = 4).total == 1L)
  }
}
