package object graft {
  /** Signature of every driver-checkable query: (session, sf dir) => result.
    * See SparkEntry.queries / Verify / Bench. */
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame
}
