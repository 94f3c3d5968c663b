package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** sign_lsh(v, tables, bitsPerTable): all random-hyperplane LSH bucket
  * ids of an embedding in ONE compiled pass — bucket t's bit b is the
  * sign of v · plane(t·bits + b), planes drawn from the canonical
  * seeded Gaussian stream ([[SignLsh.hyperplanes]], seed 42).
  *
  * Why an expression: the Column spelling ([[graft.similarity
  * .Similarity.signature]]) evaluates one interpreted aggregate∘zip_with
  * per plane — tables×bits (64-96 in the q40/q48 pipelines) independent
  * array traversals with lambda frames and
  * boxed doubles per corpus row. Here every
  * plane's dot product accumulates in the same primitive loop, in the
  * identical left-to-right IEEE order, so buckets are bit-for-bit equal
  * to the reference spelling (SimilaritySpec pins lockstep).
  *
  * Planes are generated lazily per (totalBits, dim) and cached —
  * deterministic for a given dimension; a corpus must be
  * constant-dimension (true of any embedding table).
  */
case class SignLshExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  private def vecOk(t: DataType) = t match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!vecOk(first.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"${SignLsh.NAME} arg 1 must be ARRAY<FLOAT|DOUBLE>, got ${first.dataType.catalogString}")
    else if (second.dataType != IntegerType || !second.foldable ||
             third.dataType != IntegerType || !third.foldable)
      TypeCheckResult.TypeCheckFailure(s"${SignLsh.NAME} tables/bits must be foldable INT")
    else (second.eval(), third.eval()) match {
      case (null, _) | (_, null) =>
        TypeCheckResult.TypeCheckFailure(s"${SignLsh.NAME} tables/bits must be non-NULL")
      case (t: Int, b: Int) if t < 1 || b < 1 || b > 62 || t * b > 4096 =>
        TypeCheckResult.TypeCheckFailure(
          s"${SignLsh.NAME} needs tables >= 1, 1 <= bits <= 62, tables*bits <= 4096")
      case _ => TypeCheckResult.TypeCheckSuccess
    }

  private lazy val tables: Int = second.eval().asInstanceOf[Int]
  private lazy val bits: Int = third.eval().asInstanceOf[Int]
  private def isFloat: Boolean =
    first.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any, t: Any, b: Any): Any =
    SignLsh.compute(v.asInstanceOf[ArrayData], isFloat, tables, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, _, _) => s"""
      ${ev.value} = graft.plans.SignLsh.compute($v, $isFloat, $tables, $bits);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

object SignLsh {
  val NAME = "sign_lsh"

  /** THE canonical deterministic hyperplane generator (seeded Gaussian
    * stream, row-major [bits][dim]) — Similarity.hyperplanes delegates
    * here so the Column reference spelling and this kernel can never
    * draw different planes. */
  def hyperplanes(bits: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(bits, dim)(rnd.nextGaussian())
  }

  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()
  private def planesFor(totalBits: Int, dim: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((totalBits, dim), _ => hyperplanes(totalBits, dim))

  /** One pass over the vector per plane-dot; called from generated code. */
  def compute(v: ArrayData, isFloat: Boolean, tables: Int, bits: Int): ArrayData = {
    val dim = v.numElements()
    val ps = planesFor(tables * bits, dim)
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var b = 0
      while (b < bits) {
        val plane = ps(t * bits + b)
        var s = 0.0
        var j = 0
        while (j < dim) {
          if (v.isNullAt(j)) return null // null element poisons, HOF parity
          val x = if (isFloat) v.getFloat(j).toDouble else v.getDouble(j)
          s += x * plane(j) // same left-to-right order as aggregate∘zip_with
          j += 1
        }
        if (s >= 0) bucket |= 1L << b
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  def build(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 3)
      throw new IllegalArgumentException(
        s"$NAME takes exactly (vector, tables, bitsPerTable); got ${exprs.length} args")
    SignLshExpr(exprs(0), exprs(1), exprs(2))
  }

  /** Idempotent per-session SQL registration. */
  def register(spark: SparkSession): Unit =
    Registration.tempFunction(spark, NAME, build)
}
