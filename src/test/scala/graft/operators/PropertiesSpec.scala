package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** ScalaCheck properties from SURVEY §5.2 #4: structural invariants that
  * must hold for ANY input, not just fixtures. Generators are driven
  * directly (fixed seeds, 5 cases each) — scalatestplus is not on the
  * classpath and scalacheck alone suffices. */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def cases[A](g: Gen[A], n: Int = 5): Seq[A] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default.withSize(8), Seed(i.toLong)))

  test("explode row count = sum of array lengths (E1-E4 invariant)") {
    val gen = Gen.listOf(Gen.listOf(Gen.choose(0, 100)))
    cases(gen).foreach { xs =>
      val df = (xs :+ List(1)).zipWithIndex
        .map { case (l, i) => (i.toLong, l) }.toDF("id", "arr")
      val exploded = df.select(col("id"), explode(col("arr"))).count()
      assert(exploded == (xs :+ List(1)).map(_.length).sum)
    }
  }

  test("upsert idempotence holds for arbitrary key overlap (Q2 invariant)") {
    val gen = for {
      base <- Gen.mapOf(Gen.zip(Gen.choose(0, 20), Gen.choose(0, 100)))
      upd <- Gen.mapOf(Gen.zip(Gen.choose(0, 20), Gen.choose(0, 100)))
    } yield (base, upd)
    cases(gen).foreach { case (base, upd) =>
      val b = (base.toSeq :+ (999 -> 0)).toDF("k", "v")
      val u = (upd.toSeq :+ (1000 -> 1)).toDF("k", "v")
      val once = Relational.upsert(b, u, "k").orderBy("k").collect().toSeq
      val twice = Relational.upsert(Relational.upsert(b, u, "k"), u, "k")
        .orderBy("k").collect().toSeq
      assert(once == twice)
    }
  }

  test("dedupeKeepFirst yields one row per key, keys preserved (Q1)") {
    val gen = Gen.listOf(Gen.zip(Gen.choose(0, 10), Gen.choose(0, 100)))
    cases(gen).foreach { rows =>
      val all = rows :+ ((1, 2))
      val df = all.toDF("k", "ts")
      val out = Relational.dedupeKeepFirst(df, Seq(col("k")), Seq(col("ts")))
      val keys = out.select("k").collect().map(_.getInt(0)).toSeq
      assert(keys.distinct.length == keys.length)
      assert(keys.toSet == all.map(_._1).toSet)
    }
  }

  test("exact dedup is idempotent and subset-preserving for arbitrary corpora") {
    val gen = Gen.listOf(Gen.oneOf("a b", "a b c", "x", "x y z", "q r"))
    cases(gen).foreach { texts =>
      val docs = (texts :+ "a b").zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val once = Dedup.exact(docs, col("doc_id"), col("text"))
      val twice = Dedup.exact(once, col("doc_id"), col("text"))
      assert(once.orderBy("doc_id").collect().toSeq ==
        twice.orderBy("doc_id").collect().toSeq)
      // kept texts are exactly the distinct input texts
      assert(once.select("text").distinct().count() == once.count())
      assert(once.count() == (texts :+ "a b").distinct.length)
    }
  }

  test("sessionize: session ids are contiguous from 1 per user, order-preserving") {
    val gen = Gen.listOf(Gen.zip(Gen.choose(1, 3), Gen.choose(0L, 100L)))
    cases(gen).foreach { rows =>
      val all = (rows :+ ((1, 5L))).zipWithIndex
        .map { case ((u, t), i) => (s"u$u", t * 1000L, i) }
      val out = Relational.sessionize(all.toDF("user", "ts_us", "id"),
          col("user"), col("ts_us"), col("id"), gapMicros = 2000L)
        .orderBy("user", "ts_us", "id").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
      out.groupBy(_._1).values.foreach { sess =>
        val ids = sess.sortBy(_._2).map(_._3)
        assert(ids.head == 1L)                                  // starts at 1
        assert(ids.zip(ids.tail).forall { case (a, b) => b == a || b == a + 1 }) // contiguous
      }
    }
  }

  test("approx_count_distinct within 5% of exact (SURVEY §5.2 #5)") {
    val l = graft.sources.Tables(spark, sf(), "lineitem")
    val r = l.select(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey")).as("approx")).collect().head
    val (exact, approx) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05, s"exact=$exact approx=$approx")
  }
}
