package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Mergeable-sketch operators with EXACT verified answers.
  *
  * The shape mirrors the LSH near-dup pipeline's candidate-then-verify
  * contract: a bounded-memory sketch proposes candidates (approximate,
  * partition-order-dependent), an exact pass verifies them, and the
  * FINAL answer is exact and deterministic — so unlike classic sketch
  * queries it gets a DuckDB hash-matched oracle, not a tolerance check.
  *
  * Reference counterpart: none (the reference has no aggregation at
  * all); this is north-star surface for corpus reporting at 100 TB,
  * where a full (token → count) aggregate is a vocabulary-sized
  * shuffle but the heavy-hitter set is tiny.
  */
object Sketches {

  /** Per-partition Misra-Gries summary → union of surviving keys.
    *
    * Each task keeps a capacity-k counter map over its token stream:
    * increment on hit; insert when below capacity; otherwise decrement
    * ALL counters and drop zeros (the classic MG step — at most
    * N_p/(k+1) decrements per slot, so any token with partition count
    * > N_p/(k+1) survives its partition's summary).
    *
    * Union-of-survivors completeness: if token t's global count
    * C > N/(k+1), then c_p > N_p/(k+1) in at least one partition p
    * (else C = Σc_p ≤ ΣN_p/(k+1) = N/(k+1)), so t survives there.
    * Hence candidates ⊇ every token with C > N/(k+1) ⊇ every token
    * with C·k > N — REGARDLESS of partition layout or arrival order,
    * which is what makes the verified composition deterministic even
    * though each individual summary isn't.
    *
    * Scale shape: one narrow pass, O(k) memory per task, ≤ k keys
    * emitted per partition — never a vocabulary-sized structure. */
  def mgCandidates(tokens: Dataset[String], k: Int): DataFrame = {
    import tokens.sparkSession.implicits._
    require(k >= 1, s"sketch capacity k=$k must be >= 1")
    tokens.mapPartitions { it =>
      val m = scala.collection.mutable.HashMap[String, Long]()
      it.foreach { t =>
        m.get(t) match {
          case Some(c) => m.update(t, c + 1)
          case None if m.size < k => m.update(t, 1L)
          case None => // MG decrement-all; zeros vacate slots
            val dead = scala.collection.mutable.ArrayBuffer[String]()
            m.foreach { case (key, c) =>
              if (c == 1L) dead += key else m.update(key, c - 1)
            }
            dead.foreach(m.remove)
        }
      }
      m.keysIterator
    }.toDF("token").distinct()
  }

  val queries: Map[String, Q] = Map(
    // EXACT global heavy hitters (count·k > N, k = 40) via the MG
    // candidate pass + exact recount of candidates only. Three narrow
    // corpus passes (sketch, total, recount) instead of one
    // vocabulary-sized aggregate; the only shuffled rows are the
    // candidate-matched map-side partials and the ≤ k·partitions
    // candidate keys. On this corpus (31-token vocabulary) the sketch
    // never evicts — SketchesSpec drives the eviction path on an
    // adversarial 1000-token fixture and pins the completeness law.
    "q102_heavy_hitters" -> ((s, dir) => {
      val k = 40
      val toks = Tables.fanOut(Tables.documents(s, dir).select(col("text")))
        .select(explode(split(trim(col("text")), "\\s+")).as("token"))
        .filter(length(col("token")) > 0)
      import s.implicits._
      val cands = mgCandidates(toks.as[String], k)
      // bounded driver action: ONE already-aggregated long (the same
      // contract as the incremental-append min/max row) — a 1-row
      // cross join here would plan as BroadcastNestedLoopJoin, which
      // PlanSpec bans
      val nTotal = toks.agg(count(lit(1))).as[Long].head()
      toks.join(broadcast(cands), Seq("token"), "left_semi")
        .groupBy("token").agg(count(lit(1)).as("n"))
        .filter(col("n") * k > nTotal)
        .select(col("token"), col("n"))
        .orderBy("token")
    })
  )

  val oracles: Map[String, String] = Map(
    // the exact definition the sketch+verify composition must equal
    "q102_heavy_hitters" ->
      """WITH t AS (
           SELECT unnest(str_split_regex(trim(text), '\s+')) AS token
           FROM documents),
         t2 AS (SELECT token FROM t WHERE len(token) > 0)
         SELECT token, COUNT(*) AS n FROM t2 GROUP BY token
         HAVING COUNT(*) * 40 > (SELECT COUNT(*) FROM t2)
         ORDER BY token"""
  )
}
