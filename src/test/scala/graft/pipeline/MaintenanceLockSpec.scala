package graft.pipeline

import java.nio.file.Files

import graft.SparkSpec

class MaintenanceLockSpec extends SparkSpec {

  test("second writer inside the critical section fails loudly") {
    val dir = Files.createTempDirectory("mlock").toString + "/store"
    var ran = false
    MaintenanceLock.withLock(dir) {
      val ex = intercept[java.io.IOException] {
        MaintenanceLock.withLock(dir) { fail("loser must not run") }
      }
      assert(ex.getMessage.contains("concurrent maintenance writer"))
      ran = true
    }
    assert(ran)
    // released: a later writer proceeds
    MaintenanceLock.withLock(dir) { ran = false }
    assert(!ran)
  }

  test("lock released on body failure; tags are independent") {
    val dir = Files.createTempDirectory("mlock2").toString + "/store"
    intercept[RuntimeException] {
      MaintenanceLock.withLock(dir) { throw new RuntimeException("boom") }
    }
    MaintenanceLock.withLock(dir) { () } // not deadlocked
    MaintenanceLock.withLock(dir, tag = "_a") {
      MaintenanceLock.withLock(dir, tag = "_b") { () } // different unit
      intercept[java.io.IOException] {
        MaintenanceLock.withLock(dir, tag = "_a") { () }
      }
    }
  }

  test("an orphaned lease is broken after its TTL") {
    val dir = Files.createTempDirectory("mlock3").toString + "/store"
    val parent = new java.io.File(dir).getParentFile
    intercept[java.io.IOException] {
      MaintenanceLock.withLock(dir) {
        MaintenanceLock.withLock(dir) { () }
      }
    }
    // simulate a dead holder: plant a lock and age it past the lease
    MaintenanceLock.withLock(dir) { () }
    val lock = new java.io.File(parent, ".store.__lock")
    assert(lock.createNewFile(), "plant an orphan lock")
    assert(lock.setLastModified(System.currentTimeMillis() - 3600000L))
    var ran = false
    MaintenanceLock.withLock(dir, leaseMs = 1000L) { ran = true }
    assert(ran, "stale lease must be broken, not deadlock maintenance")
  }

  test("Rollup.merge under an interleaved concurrent merge: loser fails loudly, no silent fold drop") {
    import spark.implicits._
    val store = Files.createTempDirectory("mlock_rollup").toString + "/s"
    val spec = Rollup.Spec(Seq("g"), sumCols = Seq("x"))
    Rollup.init(spark, store,
      Seq(("a", 1L), ("b", 2L)).toDF("g", "x"), spec, "base")
    // writer 1 is mid-merge (holds the store lock) when writer 2's
    // merge arrives — writer 2 must fail LOUDLY, not silently lose
    MaintenanceLock.withLock(store) {
      val ex = intercept[java.io.IOException] {
        Rollup.merge(spark, store,
          Seq(("a", 10L)).toDF("g", "x"), spec, "b2")
      }
      assert(ex.getMessage.contains("concurrent maintenance writer"))
    }
    // the refused fold was NOT applied — no half-state
    assert(Rollup.appliedIds(spark, store).sorted == Seq("base"))
    // and retrying after the writer finished succeeds exactly once
    assert(Rollup.merge(spark, store,
      Seq(("a", 10L)).toDF("g", "x"), spec, "b2"))
    val rows = Rollup.read(spark, store, spec)
      .select("g", "n", "sum_x").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows == Set(("a", 2L, 11.0), ("b", 1L, 2.0)))
  }
}
