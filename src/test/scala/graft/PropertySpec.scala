package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Bloom, IncrementalAgg, Salt, Sampling, Transform, Upsert}

/** ScalaCheck-generator property coverage of the algebraic invariants
  * SURVEY §5.2 calls for: dedupe key-uniqueness/coverage, semi ∪ anti =
  * input, upsert cardinality, salted-join equivalence. Samples are drawn
  * with fixed seeds (deterministic CI); each case is a Spark job, so the
  * draw count stays small. */
class PropertySpec extends SparkSpec {
  import sqlImplicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val rowsGen: Gen[List[(Int, Int, Int)]] =
    Gen.nonEmptyListOf(for {
      k <- Gen.chooseNum(0, 15)
      a <- Gen.chooseNum(-50, 50)
      b <- Gen.chooseNum(-50, 50)
    } yield (k, a, b))

  test("dedupe: unique keys, key coverage, window == aggregate form") {
    samples(rowsGen, 5).foreach { rows =>
      val df = rows.toDF("k", "a", "b")
      val ord = Seq(col("a"), col("b"))
      val w = Transform.dedupeKeepLast(df, Seq("k"), ord)
      val keys = w.select("k").collect().map(_.getInt(0))
      assert(keys.length == keys.distinct.length)
      assert(keys.toSet == rows.map(_._1).toSet)
      val g = Transform.dedupeKeepLastAgg(df, Seq("k"), ord)
      assert(w.orderBy("k").collect().map(_.toSeq).toSeq ==
        g.orderBy("k").collect().map(_.toSeq).toSeq)
    }
  }

  test("fkSplit: semi ∪ anti == input, disjoint") {
    val gen = for { rows <- rowsGen; dims <- Gen.listOf(Gen.chooseNum(0, 15)) }
      yield (rows, dims)
    samples(gen, 5).foreach { case (rows, dimKeys) =>
      val df = rows.toDF("fk", "a", "b")
      val dim = (if (dimKeys.isEmpty) List(99) else dimKeys).toDF("id")
      val (valid, rejects) = Transform.fkSplit(df, dim, Seq("fk"), Seq("id"))
      assert(valid.count() + rejects.count() == rows.length.toLong)
      assert(valid.intersect(rejects).isEmpty)
    }
  }

  test("upsert: |result| = |target keys ∪ stage keys|, stage wins") {
    val gen = for {
      tk <- Gen.listOf(Gen.chooseNum(0, 20)); sk <- Gen.listOf(Gen.chooseNum(0, 20))
    } yield (tk.distinct, sk.distinct)
    samples(gen, 5).foreach { case (tk, sk) =>
      if (tk.nonEmpty || sk.nonEmpty) {
        val target = tk.map(k => (k, s"t$k")).toDF("k", "v")
        val stage = sk.map(k => (k, s"s$k")).toDF("k", "v")
        val out = Upsert.upsert(target, stage, Seq("k"))
          .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
        assert(out.keySet == (tk.toSet ++ sk.toSet))
        sk.foreach(k => assert(out(k) == s"s$k"))
        tk.filterNot(sk.contains).foreach(k => assert(out(k) == s"t$k"))
      }
    }
  }

  test("incremental agg: merge(state(batches)) == state(whole) for any split") {
    val gen = for {
      rows <- Gen.nonEmptyListOf(for {
        g <- Gen.oneOf("x", "y", "z")
        cents <- Gen.chooseNum(-100000L, 100000L)
      } yield (g, cents / 100.0))
      cut <- Gen.chooseNum(0, 30)
    } yield (rows, cut min rows.length)
    samples(gen, 5).foreach { case (rows, cut) =>
      val (a, b) = rows.splitAt(cut)
      val keys = Seq("g"); val ms = Seq("amt")
      def st(rs: List[(String, Double)]) =
        IncrementalAgg.state(
          if (rs.isEmpty) rows.toDF("g", "amt").limit(0) else rs.toDF("g", "amt"),
          keys, ms)
      val merged = IncrementalAgg.merge(keys, ms)(st(a), st(b))
        .orderBy("g").collect().map(_.toSeq).toSeq
      val whole = st(rows).orderBy("g").collect().map(_.toSeq).toSeq
      assert(merged == whole)
    }
  }

  test("stratified sample: membership == per-stratum flat sample, nested in rate") {
    val gen = for {
      n <- Gen.chooseNum(50, 300)
      tEn <- Gen.chooseNum(0, 256)
      tOther <- Gen.chooseNum(0, 256)
    } yield (n, tEn, tOther)
    samples(gen, 5).foreach { case (n, tEn, tOther) =>
      val df = (1 to n).map(i => (i.toLong, if (i % 2 == 0) "en" else "fr"))
        .toDF("id", "lang")
      val out = Sampling.stratifiedSample(df, "id", "lang", Map("en" -> tEn), tOther)
        .collect().map(_.getLong(0)).toSet
      val flat =
        Sampling.hashSample(df.filter(col("lang") === "en"), "id", tEn)
          .collect().map(_.getLong(0)).toSet ++
        Sampling.hashSample(df.filter(col("lang") =!= "en"), "id", tOther)
          .collect().map(_.getLong(0)).toSet
      assert(out == flat)
      // monotone: a lower threshold is a subset of a higher one
      val lower = Sampling.stratifiedSample(df, "id", "lang",
        Map("en" -> (tEn / 2)), tOther / 2).collect().map(_.getLong(0)).toSet
      assert(lower.subsetOf(out))
    }
  }

  test("bloomSemiJoin == plain semi-join for any keys and any fpp") {
    val gen = for {
      fact <- Gen.nonEmptyListOf(Gen.chooseNum(0L, 40L))
      dim <- Gen.listOf(Gen.chooseNum(0L, 40L))
      fpp <- Gen.oneOf(0.01, 0.2, 0.8)
    } yield (fact, dim, fpp)
    samples(gen, 5).foreach { case (fact, dim, fpp) =>
      val f = fact.map(k => (k, s"p$k")).toDF("k", "p")
      val d = (if (dim.isEmpty) List(999L) else dim).toDF("dk")
      val out = Bloom.bloomSemiJoin(f, d, "k", "dk", expectedItems = 64, fpp = fpp)
        .orderBy("k", "p").collect().map(_.toSeq).toSeq
      val plain = f.join(d.select(col("dk").as("k")), Seq("k"), "left_semi")
        .orderBy("k", "p").collect().map(_.toSeq).toSeq
      assert(out == plain)
    }
  }

  test("saltedJoin == plain join for any factor") {
    val gen = for { rows <- rowsGen; f <- Gen.chooseNum(1, 6) } yield (rows, f)
    samples(gen, 5).foreach { case (rows, factor) =>
      val big = rows.toDF("k", "a", "b")
      val dim = rows.map(_._1).distinct.map(k => (k, k * 10)).toDF("k", "d")
      val salted = Salt.saltedJoin(big, dim, Seq("k"), factor)
        .orderBy("k", "a", "b").collect().map(_.toSeq).toSeq
      val plain = big.join(dim, Seq("k"))
        .orderBy("k", "a", "b").collect().map(_.toSeq).toSeq
      assert(salted == plain)
    }
  }
}
