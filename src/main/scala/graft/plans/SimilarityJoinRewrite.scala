package graft.plans

import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, AttributeSet}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, UnaryNode}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DoubleType, LongType}

/** WHOLE-OPERATOR similarity join as a Catalyst citizen (SURVEY §4's
  * stretch optimizer item; r9 verdict #4): `SimilarityJoinPlan` is a
  * logical placeholder for "all (doc_id, doc_id) pairs with character
  * n-gram Jaccard ≥ threshold over this corpus", and
  * [[ExpandSimilarityJoin]] — injected through
  * `spark.sql.extensions=graft.plans.GraftExtensions` — picks its
  * physical route AT OPTIMIZATION TIME from Catalyst statistics:
  *
  *  - small corpus (optimizer-estimated bytes ≤
  *    `spark.graft.simJoinRewrite.maxBruteForceBytes`, default 64 MB):
  *    the exact inverted-index route ([[graft.dedup.Dedup.jaccardPairs]]
  *    — already no cross product, but its gram self-join emits
  *    Σ_g freq(g)² pair rows, quadratic in the hottest gram);
  *  - oversized corpus AND `spark.graft.simJoinRewrite.enabled=true`
  *    (DEFAULT FALSE — the rewrite is opt-in): the MinHash+LSH
  *    candidate route ([[graft.dedup.Dedup.minhashNearDups]] — banding
  *    bounds the pair stream by collisions, the exact verify restores
  *    precision 1), i.e. the q37/q86 production pipeline.
  *
  * This is the declarative contract Catalyst gives every built-in
  * operator, extended to one it lacks: the USER writes the semantics
  * once ([[SimilarityJoin.of]]) and the planner — not the call site —
  * decides whether the corpus affords exactness. The trade is recall:
  * LSH banding may miss a qualifying pair (the q37 NO_ORACLE entry),
  * which is exactly why the rewrite sits behind an explicit flag
  * instead of firing silently.
  *
  * Mechanics worth naming:
  *  - the placeholder survives analysis (resolved output, resolved
  *    child) and is expanded in the user-provided optimizer batch;
  *    sessions WITHOUT the extension fail loudly at planning (no
  *    strategy for SimilarityJoinPlan), never silently wrong;
  *  - the expansion builds its route with the public DataFrame API on
  *    the child plan, takes the route's OPTIMIZED plan (a nested,
  *    self-contained QueryExecution — pushdown and pruning still
  *    happen inside it), and re-aliases the route's output onto the
  *    placeholder's exprIds so parent operators keep resolving;
  *  - stats come from `child.stats` — the same estimate the broadcast
  *    planner reads, no extra jobs at plan time.
  */
case class SimilarityJoinPlan(child: LogicalPlan, n: Int, threshold: Double,
                              override val output: Seq[Attribute])
    extends UnaryNode {
  override def producedAttributes: AttributeSet = AttributeSet(output)
  // the expansion reads doc_id AND text from the child; without this,
  // ColumnPruning (which runs before the user-provided batch) strips
  // the child to an empty projection and the expansion can't resolve
  override def references: AttributeSet = child.outputSet
  override protected def withNewChildInternal(newChild: LogicalPlan): SimilarityJoinPlan =
    copy(child = newChild)
}

object SimilarityJoin {
  /** Declare a similarity self-join over `docs` (needs doc_id, text).
    * The session must carry [[GraftExtensions]] so the planner can
    * expand it. */
  def of(docs: DataFrame, n: Int, threshold: Double): DataFrame = {
    val out = Seq(
      AttributeReference("a_id", LongType)(),
      AttributeReference("b_id", LongType)(),
      AttributeReference("jaccard", DoubleType)())
    GraftBridge.ofRows(docs.sparkSession,
      SimilarityJoinPlan(docs.queryExecution.analyzed, n, threshold, out))
  }
}

case class ExpandSimilarityJoin(session: SparkSession) extends Rule[LogicalPlan] {

  private def rewriteEnabled: Boolean =
    session.conf.getOption("spark.graft.simJoinRewrite.enabled")
      .exists(_.toBoolean) // DEFAULT OFF — LSH recall is opt-in

  private def bruteBudget: Long =
    session.conf.getOption("spark.graft.simJoinRewrite.maxBruteForceBytes")
      .map(_.toLong).getOrElse(64L << 20)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case sj: SimilarityJoinPlan =>
      val docs = GraftBridge.ofRows(session, sj.child)
      val oversized = sj.child.stats.sizeInBytes > bruteBudget
      val route =
        if (rewriteEnabled && oversized) {
          logWarning(s"graft: similarity join over estimated " +
            s"${sj.child.stats.sizeInBytes} bytes exceeds brute-force budget " +
            s"$bruteBudget — rewriting to the MinHash+LSH candidate route")
          graft.dedup.Dedup.minhashNearDups(docs, sj.n, k = 32, bands = 8,
            threshold = sj.threshold)
        } else
          graft.dedup.Dedup.jaccardPairs(docs, sj.n)
            .filter(col("jaccard") >= sj.threshold)
      // nested, self-contained optimization of the route; re-alias its
      // output onto the placeholder's exprIds so the parent plan keeps
      // resolving
      val expanded = route.queryExecution.optimizedPlan
      Project(expanded.output.zip(sj.output).map { case (src, dst) =>
        Alias(src, dst.name)(exprId = dst.exprId)
      }, expanded)
  }
}
