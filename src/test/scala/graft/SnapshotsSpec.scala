package graft

import org.apache.spark.sql.functions._
import graft.operators.Snapshots

class SnapshotsSpec extends SparkSpec {
  import spark.implicits._

  test("diff: added/deleted partition the symmetric difference (S13)") {
    val prev = Seq(("A", "a"), ("B", "b"), ("C", "c")).toDF("symbol", "name")
    val cur = Seq(("B", "b"), ("C", "c2"), ("D", "d")).toDF("symbol", "name")
    val added = Snapshots.diffAdded(cur, prev, "symbol").select("symbol").as[String].collect()
    val deleted = Snapshots.diffDeleted(cur, prev, "symbol").select("symbol").as[String].collect()
    assert(added.toSet == Set("D") && deleted.toSet == Set("A"))
  }

  test("rename detect: substring + token branches, no false pairs (S14)") {
    val deleted = Seq(
      ("OLD1", "Alpha Industries"),          // substring: name ⊂ new
      ("OLD2", "Gamma Steel HOLDINGS"),      // token: 'Gamma'? tokens >3 chars
      ("OLD3", "Zzz")                        // matches nothing
    ).toDF("old_symbol", "old_name")
    val added = Seq(
      ("NEW1", "Alpha Industries Limited"),
      ("NEW2", "GROUP Steel Works"),
      ("NEW3", "Unrelated Co")
    ).toDF("new_symbol", "new_name")
    val got = Snapshots.detectRenames(deleted, added)
      .select("old_symbol", "new_symbol").as[(String, String)].collect().toSet
    // OLD2 'Steel' token (len>3) occurs in 'GROUP Steel Works', both >10 chars
    assert(got == Set(("OLD1", "NEW1"), ("OLD2", "NEW2")))
  }

  test("rename detect: glued word-in-word containment is excluded by design (S14 envelope)") {
    // The raw reference predicate would accept this pair via its token
    // branch: token 'Steel' of old_name occurs INSIDE the single word
    // 'PakSteelCo' of new_name (instr substring match, both names >10
    // chars). The span-blocked engine intentionally excludes non-token-
    // aligned matches — and the q11/q12 oracle SQL encodes the same
    // blocked cand semantics, so engine and oracle agree on this case.
    val deleted = Seq(("OLD1", "Pak Steel Limitd")).toDF("old_symbol", "old_name")
    val added = Seq(("NEW1", "PakSteelCo Holdings")).toDF("new_symbol", "new_name")
    // sanity: the literal reference predicate DOES accept the pair
    val rawPred = deleted.crossJoin(added).filter(
      expr("instr(new_name, old_name) > 0") ||
      expr("instr(old_name, new_name) > 0") ||
      (length(col("old_name")) > 10 && length(col("new_name")) > 10 &&
        expr("exists(filter(split(old_name, ' '), w -> length(w) > 3), " +
             "w -> instr(new_name, w) > 0)"))).count()
    assert(rawPred == 1L, "fixture must trigger the glued token-in-word branch")
    // ...but the blocked engine (and the oracle's blocked cand CTE) does not
    assert(Snapshots.detectRenames(deleted, added).isEmpty)
  }

  test("rename detect: ambiguous 1:2 resolves deterministically (§7.4.1)") {
    val deleted = Seq(("OLD1", "Acme Holdings Ltd")).toDF("old_symbol", "old_name")
    val added = Seq(("NEWB", "Acme Holdings Ltd B"), ("NEWA", "Acme Holdings Ltd A"))
      .toDF("new_symbol", "new_name")
    val got = Snapshots.detectRenames(deleted, added)
      .select("old_symbol", "new_symbol").as[(String, String)].collect().toSeq
    assert(got == Seq(("OLD1", "NEWA"))) // lexicographically smallest new wins
  }

  test("rename detect: two olds cannot claim the same new (greedy 1:1)") {
    val deleted = Seq(("OLDA", "Beta Cement"), ("OLDB", "Beta Cement Co"))
      .toDF("old_symbol", "old_name")
    val added = Seq(("NEW1", "Beta Cement Co Limited")).toDF("new_symbol", "new_name")
    val got = Snapshots.detectRenames(deleted, added)
      .select("old_symbol", "new_symbol").as[(String, String)].collect().toSeq
    assert(got == Seq(("OLDA", "NEW1"))) // smallest old wins the contested new
  }

  test("merge: sentinel branches (S16, update_ticker_info.py:170-181)") {
    val old = Seq(
      ("AAA", "No record found", "Unknown", ""),           // all updatable
      ("BBB", "Real Name", "Cement", "https://x/BBB"),     // fresh identical → no_change
      ("CCC", "Old Name", "Banking", "https://x/CCC"),     // fresh differs → updates
      ("DDD", "No record found", "Unknown", "")            // no fresh row → failed
    ).toDF("symbol", "name", "sector", "url")
    val fresh = Seq(
      ("AAA", "Aaa Corp", "Energy", "https://x/AAA"),
      ("BBB", "Real Name", "Cement", "https://x/BBB"),
      ("CCC", "New Name", "Textile", "https://x/CCC2"),
      // EEE present in fresh only — must not invent a row (left join)
      ("EEE", "Ghost", "None", "https://x/EEE")
    ).toDF("symbol", "name", "sector", "url")
    val m = Snapshots.mergeUpsert(old, fresh).orderBy("symbol").collect()
    assert(m.length == 4)
    val bySym = m.map(r => r.getString(0) -> r).toMap
    assert(bySym("AAA").getString(1) == "Aaa Corp" && bySym("AAA").getInt(4) == 1)
    assert(bySym("BBB").getString(1) == "Real Name" && bySym("BBB").getInt(4) == 0)
    assert(bySym("CCC").getString(3) == "https://x/CCC2" && bySym("CCC").getInt(6) == 1)
    assert(bySym("DDD").getInt(7) == 1) // failed
    // sentinel fresh name must never be applied
    val freshSentinel = Seq(("CCC", "No record found", "Unknown", ""))
      .toDF("symbol", "name", "sector", "url")
    val m2 = Snapshots.mergeUpsert(old.filter($"symbol" === "CCC"), freshSentinel).collect()(0)
    assert(m2.getString(1) == "Old Name" && m2.getString(2) == "Banking")
  }

  test("merge: duplicate details symbols collapse to ONE row, deterministically (r12 ADVICE)") {
    // the reference keys details by symbol (dict), so a source yielding
    // the same symbol twice must not fan out snapshot rows through the
    // join — and the winner must be layout-independent (max struct)
    val old = Seq(("AAA", "Old Name", "Banking", "https://x/AAA"))
      .toDF("symbol", "name", "sector", "url")
    val dupFresh = Seq(
      ("AAA", "Aaa Corp", "Energy", "https://x/AAA1"),
      ("AAA", "Zzz Corp", "Textile", "https://x/AAA2")
    ).toDF("symbol", "name", "sector", "url")
    val m = Snapshots.mergeUpsert(old, dupFresh).collect()
    assert(m.length == 1, "duplicate details rows must not fan out the snapshot")
    // max(struct(name, sector, url)) → the lexicographically largest
    // name wins, independent of partition layout
    assert(m(0).getString(1) == "Zzz Corp")
    val mRev = Snapshots.mergeUpsert(old, dupFresh.repartition(7)).collect()
    assert(mRev.length == 1 && mRev(0).getString(1) == "Zzz Corp",
      "winner must be independent of partition layout")
  }

  test("change log classifies and excludes rename pairs (S15)") {
    val added = Seq(("N1", "x"), ("N2", "y")).toDF("new_symbol", "new_name")
    val deleted = Seq(("O1", "x"), ("O2", "z")).toDF("old_symbol", "old_name")
    val renamed = Seq(("O1", "x", "N1", "x2")).toDF("old_symbol", "old_name", "new_symbol", "new_name")
    val log = Snapshots.changeLog(added, deleted, renamed)
      .select("change_type", "symbol").as[(String, String)].collect().toSet
    assert(log == Set(("ADDED", "N2"), ("DELETED", "O2"), ("RENAMED", "O1")))
  }

  test("generations plant every diff branch (FIXTURES A5)") {
    val (g1, g2) = Snapshots.generations(spark, sf)
    val added = Snapshots.diffAdded(g2, g1, "symbol")
    val deleted = Snapshots.diffDeleted(g2, g1, "symbol")
    // 150 customers at sf0.001: 15 per mod class
    assert(added.count() == 45)   // mod 3 pure adds + mod5 X + mod6 Y
    assert(deleted.count() == 45) // mod 4 pure deletes + mod5/mod6 olds
    val ren = Snapshots.detectRenames(
      deleted.select($"symbol".as("old_symbol"), $"name".as("old_name")),
      added.select($"symbol".as("new_symbol"), $"name".as("new_name")))
    assert(ren.count() == 30)     // all mod5 + mod6 pairs, nothing else
  }

  test("q117 SCD2 intervals tile each key's timeline exactly") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q117_scd2_intervals")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    val evCount = Tables.events(spark, sf).filter($"user_id" < 100)
      .groupBy("user_id").count()
      .as[(Long, Long)].collect().toMap
    byUser.foreach { case (uid, vs) =>
      val sorted = vs.sortBy(_.getAs[Long]("version"))
      // versions are 1..n with exactly one open (current) interval
      assert(sorted.map(_.getAs[Long]("version")).sameElements(1L to sorted.length))
      assert(vs.count(_.getAs[Boolean]("is_current")) == 1)
      // contiguous: each interval closes at its successor's start
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[java.sql.Timestamp]("valid_to") ==
            b.getAs[java.sql.Timestamp]("valid_from"), s"gap in user $uid")
        case _ =>
      }
      // run-length: consecutive versions never share the attribute
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[String]("attr") != b.getAs[String]("attr"),
            s"user $uid has an unmerged run")
        case _ =>
      }
      // coverage: run sizes sum to the key's event count
      assert(vs.map(_.getAs[Long]("n_events")).sum == evCount(uid))
    }
  }
}
