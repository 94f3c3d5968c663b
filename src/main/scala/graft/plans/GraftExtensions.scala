package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension entry point: registers the engine's custom
  * Catalyst expressions for ANY session (including pure-SQL ones),
  * via config instead of code:
  *
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  *
  * (The per-session `SortedIntersectCount.register` path stays for
  * sessions the library did not create.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier(SortedIntersectCount.NAME),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, SortedIntersectCount.NAME),
      (exprs: Seq[Expression]) => SortedIntersectCount.build(exprs)))
    e.injectFunction((
      FunctionIdentifier(DotScaled.NAME),
      new ExpressionInfo(classOf[DotScaled].getName, DotScaled.NAME),
      (exprs: Seq[Expression]) => DotScaled.build(exprs)))
    e.injectFunction((
      FunctionIdentifier(SimHash64.NAME),
      new ExpressionInfo(classOf[SimHash64Expr].getName, SimHash64.NAME),
      (exprs: Seq[Expression]) => SimHash64.build(exprs)))
    e.injectFunction((
      FunctionIdentifier(MinHashSigs.NAME),
      new ExpressionInfo(classOf[MinHashSigsExpr].getName, MinHashSigs.NAME),
      (exprs: Seq[Expression]) => MinHashSigs.build(exprs)))
    e.injectFunction((
      FunctionIdentifier(MinHashSigsTokens.NAME),
      new ExpressionInfo(classOf[MinHashSigsTokensExpr].getName, MinHashSigsTokens.NAME),
      (exprs: Seq[Expression]) => MinHashSigsTokens.build(exprs)))
    e.injectFunction((
      FunctionIdentifier(SignLsh.NAME),
      new ExpressionInfo(classOf[SignLshExpr].getName, SignLsh.NAME),
      (exprs: Seq[Expression]) => SignLsh.build(exprs)))
    e.injectFunction((
      FunctionIdentifier(WinnowFp.NAME),
      new ExpressionInfo(classOf[WinnowFpExpr].getName, WinnowFp.NAME),
      (exprs: Seq[Expression]) => WinnowFp.build(exprs)))
    e.injectFunction((
      FunctionIdentifier(SortedShingles.NAME),
      new ExpressionInfo(classOf[SortedShinglesExpr].getName, SortedShingles.NAME),
      (exprs: Seq[Expression]) => SortedShingles.build(exprs)))
    e.injectFunction((
      FunctionIdentifier(SortedTokenShingles.NAME),
      new ExpressionInfo(classOf[SortedTokenShinglesExpr].getName, SortedTokenShingles.NAME),
      (exprs: Seq[Expression]) => SortedTokenShingles.build(exprs)))
    // post-optimization safety net: oversized BROADCAST hints are
    // demoted before JoinSelection can turn them into driver OOMs
    e.injectOptimizerRule(session => DemoteOversizedBroadcasts(session))
    // whole-operator similarity join: expands SimilarityJoinPlan into
    // the exact inverted-index route, or (opt-in, stats-gated) the
    // MinHash+LSH candidate route — see SimilarityJoinRewrite.scala
    e.injectOptimizerRule(session => ExpandSimilarityJoin(session))
  }
}
