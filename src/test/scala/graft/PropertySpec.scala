package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Salt, Transform, Upsert}

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
