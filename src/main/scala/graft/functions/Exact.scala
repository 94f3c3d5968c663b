package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataTypes, DoubleType}

/** Cross-engine-exact numeric aggregation helpers.
  *
  * The driver hash-compares our parquet output against DuckDB running the
  * `oracleSql` twin on the same tables. Double-precision SUM/AVG are
  * order-dependent in the last ulp, and both engines aggregate in parallel
  * with nondeterministic partial orders — so a naive `sum(double)` can
  * hash-mismatch while being "equal". The fix: cast each addend to a fixed
  * DECIMAL scale first. decimal addition is exact and order-independent,
  * and the double→decimal cast is deterministic given the same input value
  * (an exact round-half tie would require the double to equal k + 5e-5
  * exactly, which is not dyadic, hence impossible — both engines always
  * round the same way).
  *
  * One more wrinkle: the driver canonicalizes DuckDB results through
  * pandas (DECIMAL → float64) but reads our parquet through pyarrow
  * (DECIMAL → Decimal objects) — so a DECIMAL column in the FINAL output
  * can never hash-match, even with identical types and values. Final
  * output columns therefore must be DOUBLE: sum exactly in decimal, then
  * cast the result once. The decimal→double cast is deterministic and
  * identical cross-engine (IEEE nearest-even from the same exact value).
  *
  * Every helper here has a 1:1 SQL spelling used in the oracle strings:
  *   dsum(c)  ~ CAST(SUM(CAST(c AS DECIMAL(18,4))) AS DECIMAL(38,4))
  *     (internal only — never a final output column; DuckDB's native
  *     SUM(DECIMAL(p,s)) is already DECIMAL(38,s) so the oracle spelling
  *     omits the outer cast)
  *   dsumd(c) ~ CAST(SUM(CAST(c AS DECIMAL(18,4))) AS DOUBLE)
  *   dmean(c) ~ CAST(SUM(CAST(c AS DECIMAL(18,4))) AS DOUBLE) / COUNT(c)
  */
object Exact {
  val D18_4 = DataTypes.createDecimalType(18, 4)

  /** DuckDB's SUM(DECIMAL(p,s)) result type is DECIMAL(38,s); Spark's is
    * DECIMAL(p+10,s). The driver's hash is type-sensitive, so pin the sum
    * result to DuckDB's spelling. */
  val D38_4 = DataTypes.createDecimalType(38, 4)

  /** Addend pinned to scale 4 — exact, order-independent summation. */
  def dec(c: Column): Column = c.cast(D18_4)

  /** Exact decimal sum of a double column (scale 4), result pinned to
    * DECIMAL(38,4) to match DuckDB's SUM result type exactly. Use only
    * as an intermediate — final output columns must use [[dsumd]]. */
  def dsum(c: Column): Column = sum(dec(c)).cast(D38_4)

  /** Exact decimal sum surfaced as DOUBLE — the only decimal-sum shape
    * safe for FINAL output columns (see object doc: the driver's DuckDB
    * and pyarrow decimal representations never hash-equal). */
  def dsumd(c: Column): Column = dsum(c).cast(DoubleType)

  /** Windowed exact decimal sum surfaced as DOUBLE, same rule as
    * [[dsumd]] for windowed final columns. */
  def dsumOverD(c: Column, w: org.apache.spark.sql.expressions.WindowSpec): Column =
    sum(dec(c)).over(w).cast(DoubleType)

  /** Order-independent mean: exact decimal sum, one double division.
    * Identical IEEE result in Spark and DuckDB given identical inputs. */
  def dmean(c: Column): Column = dsum(c).cast(DoubleType) / count(c)
}
