package graft

/** Mechanical laws for the checkpoint-release registry (r10 verdict #1
  * — the bench back-half drift fix lives or dies on these semantics):
  * pin materializes and registers, unpin/releaseAll actually remove
  * the checkpoint's blocks from the block manager, and scoped cleanup
  * frees ONLY its own registrations (an outer pin must survive a
  * streaming micro-batch's cleanup and stay readable — a released
  * checkpoint is unrecoverable, so over-release is a correctness bug,
  * not a perf bug). */
class CachesSpec extends SparkSpec {
  import spark.implicits._

  private def persistentCount: Int = spark.sparkContext.getPersistentRDDs.size

  test("pin registers a released-on-unpin checkpoint; data survives until then") {
    Caches.releaseAll()
    val base = persistentCount
    val df = Caches.pin((1 to 100).toDF("x"))
    assert(persistentCount > base, "pin must persist the checkpoint RDD")
    assert(Caches.pinnedCount >= 1)
    assert(df.count() == 100) // readable while pinned
    Caches.unpin(df)
    assert(persistentCount == base, "unpin must free the checkpoint's RDD")
    assert(Caches.pinnedCount == 0)
    // double-unpin and unpin of a never-pinned frame are no-ops
    Caches.unpin(df)
    Caches.unpin((1 to 3).toDF("y"))
    assert(persistentCount == base)
  }

  test("releaseAll frees every surviving pin and cache") {
    Caches.releaseAll()
    val base = persistentCount
    val a = Caches.pin((1 to 10).toDF("x"))
    val b = Caches.pin((1 to 20).toDF("x"))
    Caches.cached((1 to 30).toDF("x")).count()
    assert(a.count() == 10 && b.count() == 20)
    assert(Caches.pinnedCount == 2)
    Caches.releaseAll()
    assert(Caches.pinnedCount == 0)
    // non-blocking unpersist: poll briefly for the block manager to drain
    val deadline = System.nanoTime() + 10_000_000_000L
    while (persistentCount > base && System.nanoTime() < deadline) Thread.sleep(50)
    assert(persistentCount == base,
      s"releaseAll must drain the block manager (still ${persistentCount - base} extra)")
  }

  test("scoped releases ONLY its own registrations — outer pins survive and stay readable") {
    Caches.releaseAll()
    val outer = Caches.pin((1 to 50).toDF("x"))
    val innerSeen = Caches.scoped {
      val inner = Caches.pin((1 to 7).toDF("x"))
      Caches.cached((1 to 9).toDF("x")).count()
      inner.count()
    }
    assert(innerSeen == 7)
    assert(Caches.pinnedCount == 1, "only the outer pin may survive the scope")
    // the outer checkpoint must still be READABLE (a released checkpoint
    // cannot recompute — this is the correctness half of the law)
    assert(outer.count() == 50)
    Caches.releaseAll()
  }

  test("scoped releases its registrations even when the body throws") {
    Caches.releaseAll()
    intercept[RuntimeException] {
      Caches.scoped {
        Caches.pin((1 to 5).toDF("x"))
        throw new RuntimeException("batch failure")
      }
    }
    assert(Caches.pinnedCount == 0, "a failed batch must not leak its pins")
  }
}
