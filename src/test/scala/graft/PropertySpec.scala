package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.{Relational, Snapshots}

/** Property-based laws from SURVEY.md §5: normalize idempotence, diff
  * partition law, merge never degrades to sentinels, calendar length. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic sampling in place of scalatest+scalacheck bridging
    * (not in the offline dependency set): N pinned-seed samples. */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val symGen: Gen[String] = for {
    base <- Gen.alphaStr.map(_.take(8))
    suffix <- Gen.oneOf("", ".PA", ".XD", " ")
    pad <- Gen.oneOf("", " ", "  ")
  } yield pad + base + suffix

  test("normalizeSymbol is idempotent (S6 law)") {
    samples(Gen.listOfN(20, symGen), 8).filter(_.nonEmpty).foreach { syms =>
      val df = syms.toDF("s")
      val once = df.select(Relational.normalizeSymbol($"s").as("n"))
      val twice = once.select(Relational.normalizeSymbol($"n").as("n"))
      assert(once.as[String].collect().toSeq == twice.as[String].collect().toSeq)
    }
  }

  test("diff partition law: added ∪ deleted ∪ unchanged covers both snapshots (S13)") {
    val keyGen = Gen.listOf(Gen.choose(0, 60)).map(_.distinct)
    samples(Gen.zip(keyGen, keyGen), 6).foreach { case (prevK, curK) =>
      val prev = prevK.map(k => (s"T$k", s"name$k")).toDF("symbol", "name")
      val cur = curK.map(k => (s"T$k", s"name$k")).toDF("symbol", "name")
      val added = Snapshots.diffAdded(cur, prev, "symbol").count()
      val deleted = Snapshots.diffDeleted(cur, prev, "symbol").count()
      val unchanged = cur.join(prev, Seq("symbol"), "left_semi").count()
      assert(added + unchanged == curK.size)
      assert(deleted + unchanged == prevK.size)
    }
  }

  test("merge never overwrites a real value with a sentinel (S16 law)") {
    val nameGen = Gen.oneOf("Alpha Corp", "Beta Ltd", "No record found")
    val sectorGen = Gen.oneOf("Cement", "Banking", "Unknown")
    val rows = Gen.listOfN(12, for {
      i <- Gen.choose(0, 11); n <- nameGen; s <- sectorGen
    } yield (s"T$i", n, s, ""))
    samples(Gen.zip(rows, rows), 6).foreach { case (oldR, freshR) =>
      val old = oldR.distinctBy(_._1).toDF("symbol", "name", "sector", "url")
      val fresh = freshR.distinctBy(_._1).toDF("symbol", "name", "sector", "url")
      val merged = Snapshots.mergeUpsert(old, fresh).collect()
      val oldMap = oldR.distinctBy(_._1).map(r => r._1 -> r).toMap
      merged.foreach { m =>
        val o = oldMap(m.getString(0))
        // a real old name may never become the sentinel
        if (o._2 != "No record found")
          assert(m.getString(1) != "No record found", s"degraded ${m.getString(0)}")
        if (o._3 != "Unknown")
          assert(m.getString(2) != "Unknown")
      }
    }
  }

  test("calendar length = day span + 1 for arbitrary ranges (S19 law)") {
    val dayGen = Gen.choose(0, 1200)
    samples(Gen.zip(dayGen, Gen.choose(0, 400)), 8).foreach { case (startOff, span) =>
      val start = java.time.LocalDate.of(1995, 1, 1).plusDays(startOff)
      val end = start.plusDays(span)
      val n = operators.TimeSeries.calendar(spark, start.toString, end.toString).count()
      assert(n == span + 1)
    }
  }
}
