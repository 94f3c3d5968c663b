package graft

import graft.operators.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("applyMerge merges left-to-right without overlap") {
    assert(Bpe.applyMerge(Array("a", "a", "a"), "a", "a").toSeq == Seq("aa", "a"))
    assert(Bpe.applyMerge(Array("h", "u", "g", "s"), "u", "g").toSeq == Seq("h", "ug", "s"))
    assert(Bpe.applyMerge(Array("x"), "a", "b").toSeq == Seq("x"))
  }

  test("trainMerges learns the classic corpus's merge sequence") {
    // the standard BPE walkthrough corpus: hug×10 pug×5 pun×12 bun×4 hugs×5
    // round 1 pair counts: (u,g)=20 (h,u)=15 (p,u)=17 (u,n)=16 (b,u)=4 (g,s)=5
    // → merge (u,g); round 2: (u,n)=16 > (h,ug)=15 → (u,n); round 3: (h,ug)=15
    val wf = Seq(("hug", 10L), ("pug", 5L), ("pun", 12L), ("bun", 4L), ("hugs", 5L))
      .toDF("word", "cnt")
    val merges = Bpe.trainMerges(spark, wf, nMerges = 3)
    assert(merges == Seq((1, "u", "g", 20L), (2, "u", "n", 16L), (3, "h", "ug", 15L)),
      s"got $merges")
  }

  test("trainMerges stops early when the vocab is fully merged") {
    val wf = Seq(("ab", 3L)).toDF("word", "cnt")
    val merges = Bpe.trainMerges(spark, wf, nMerges = 10)
    assert(merges == Seq((1, "a", "b", 3L))) // after one merge, no pairs remain
  }

  test("q105 is deterministic and emits ranked merges over the corpus") {
    val a = SparkEntry.queries("q105_bpe_train")(spark, sf)
      .as[(Int, String, String, Long)].collect().toSeq
    val b = SparkEntry.queries("q105_bpe_train")(spark, sf)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(a.nonEmpty && a == b)
    assert(a.map(_._1) == (1 to a.length))
    // counts non-increasing is NOT guaranteed by BPE in general (a
    // merge can create a more frequent pair); rank order is the law
    assert(a.map(_._4).forall(_ > 0))
  }
}
