package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** Shared idempotent SQL-function registration.
  *
  * Operators call `X.register(session)` defensively before every use
  * (the session may not have been built with GraftExtensions, and
  * `spark.sql.extensions` is static — it only binds to the JVM's first
  * session). `createOrReplaceTempFunction` is safe to repeat but logs a
  * "replaced a previously registered function" WARN each time; guarding
  * on existence keeps repeated registration silent.
  */
private[plans] object Registration {
  def tempFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(name)))
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
  }
}
