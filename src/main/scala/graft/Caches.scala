package graft

import org.apache.spark.sql.DataFrame

/** Registry for operator-internal `.cache()`s so harnesses can release
  * them between queries.
  *
  * Dedup/similarity pipelines legitimately cache shared intermediates
  * (signatures, shingle indexes) that are consumed several times within
  * ONE query's plan — but a 42-query run that never unpersists them
  * accumulates every query's intermediates in the storage layer
  * (memory + spilled disk) for the life of the session. Operators
  * register caches here; Verify/Bench call [[releaseAll]] after each
  * query's consuming action completes.
  */
object Caches {
  private val active = scala.collection.mutable.ArrayBuffer[DataFrame]()

  /** Cache `df` and remember it for later release. */
  def cached(df: DataFrame): DataFrame = synchronized {
    df.cache()
    active += df
    df
  }

  /** Unpersist every registered cache (non-blocking) and forget them.
    * Safe to call while nothing is cached. */
  def releaseAll(): Unit = synchronized {
    active.foreach(_.unpersist(blocking = false))
    active.clear()
  }
}
