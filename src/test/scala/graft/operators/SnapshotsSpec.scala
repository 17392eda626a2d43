package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.sources.Snapshots

class SnapshotsSpec extends SparkSuite {
  import spark.implicits._

  test("commit/read: versions are immutable and pinnable; latest follows commits") {
    val table = java.nio.file.Files.createTempDirectory("graft-snap").toString + "/t"
    assert(Snapshots.latestVersion(table).isEmpty)
    val v1 = Snapshots.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), table)
    val v2 = Snapshots.commit(Seq((1L, "a2"), (3L, "c")).toDF("id", "s"), table)
    assert((v1, v2) == (1, 2))
    assert(Snapshots.latestVersion(table).contains(2))
    assert(Snapshots.read(spark, table, Some(1)).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
    assert(Snapshots.read(spark, table).as[(Long, String)].collect().toSet ==
      Set((1L, "a2"), (3L, "c")))
  }

  test("concurrent commits: _latest always lands on the max committed version") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val table = java.nio.file.Files.createTempDirectory("graft-snap-race").toString + "/t"
    // 8 committers race; the lock-serialized pointer publish must leave
    // _latest at the highest claimed version — the check-then-act race
    // (an older committer overwriting a newer pointer) would land lower
    val vs = Await.result(
      Future.sequence((1 to 8).map(i => Future {
        Snapshots.commit(Seq(i.toLong).toDF("id"), table)
      })), 2.minutes)
    assert(vs.sorted == (1 to 8), s"claimed versions: $vs")
    assert(Snapshots.latestVersion(table).contains(8))
    // the lock file persists by design (a mutex inode, never deleted —
    // delete-by-name reclaim is a TOCTOU); a fresh commit must still
    // acquire it cleanly
    assert(Snapshots.commit(Seq(0L).toDF("id"), table) == 9)
    assert(Snapshots.latestVersion(table).contains(9))
  }

  test("commitIfLatest publishes only when the base is unmoved (CAS for read-modify-write)") {
    val table = java.nio.file.Files.createTempDirectory("graft-snap-cas").toString + "/t"
    Snapshots.commit(Seq(1L).toDF("id"), table) // v=1
    // base unmoved: CAS succeeds
    assert(Snapshots.commitIfLatest(Seq(2L).toDF("id"), table, expectedBase = 1).contains(2))
    assert(Snapshots.latestVersion(table).contains(2))
    // base moved (now 2, expected 1): CAS refuses, pointer untouched,
    // claimed directory discarded
    assert(Snapshots.commitIfLatest(Seq(99L).toDF("id"), table, expectedBase = 1).isEmpty)
    assert(Snapshots.latestVersion(table).contains(2))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(table, "v=3")))
    assert(Snapshots.read(spark, table).as[Long].collect().toSeq == Seq(2L))
  }

  test("commitAppend: versions are full prefixes; tagged replay is a no-op; pins survive") {
    val table = java.nio.file.Files.createTempDirectory("graft-snap-app").toString + "/t"
    val v1 = Snapshots.commitAppend(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), table,
      Some("batch-0"))
    val v2 = Snapshots.commitAppend(Seq((3L, "c")).toDF("id", "s"), table, Some("batch-1"))
    val v3 = Snapshots.commitAppend(Seq((4L, "d")).toDF("id", "s"), table, Some("batch-2"))
    assert((v1, v2, v3) == (1, 2, 3))
    // each version is the FULL table as of its batch (carry-forward links)
    def ids(v: Int) = Snapshots.read(spark, table, Some(v))
      .select("id").as[Long].collect().toSet
    assert(ids(1) == Set(1L, 2L))
    assert(ids(2) == Set(1L, 2L, 3L))
    assert(ids(3) == Set(1L, 2L, 3L, 4L))
    // a replayed batch id (foreachBatch crash-recovery) returns the
    // already-committed version and writes NOTHING — exactly-once
    val replay = Snapshots.commitAppend(Seq((99L, "X")).toDF("id", "s"), table,
      Some("batch-1"))
    assert(replay == v2)
    assert(Snapshots.latestVersion(table).contains(3))
    assert(ids(3) == Set(1L, 2L, 3L, 4L))
    // a pinned mid-stream version is untouched by later appends
    assert(ids(1) == Set(1L, 2L))
    // dropping an old version never corrupts newer ones (hard links keep
    // shared bytes alive until the last name is gone)
    assert(Snapshots.drop(table, 1))
    assert(ids(3) == Set(1L, 2L, 3L, 4L))
  }

  test("taggedVersionAbove: the in-lock re-verify reads only versions above the watermark") {
    val table = java.nio.file.Files.createTempDirectory("graft-snap-floor").toString + "/t"
    Snapshots.commitAppend(Seq((1L, "a")).toDF("id", "s"), table, Some("batch-0")) // v=1
    Snapshots.commitAppend(Seq((2L, "b")).toDF("id", "s"), table, Some("batch-1")) // v=2
    Snapshots.commitAppend(Seq((3L, "c")).toDF("id", "s"), table, Some("batch-2")) // v=3
    // floor 0 = the public taggedVersion (full history)
    assert(Snapshots.taggedVersion(table, "batch-1").contains(2))
    assert(Snapshots.taggedVersionAbove(table, "batch-1", 0).contains(2))
    // the bound: a tag AT or BELOW the floor is the pre-scan's job, not
    // the lock-held re-verify's — only above-floor claims are read
    assert(Snapshots.taggedVersionAbove(table, "batch-1", 2).isEmpty)
    assert(Snapshots.taggedVersionAbove(table, "batch-2", 2).contains(3))
    assert(Snapshots.taggedVersionAbove(table, "batch-2", 3).isEmpty)
    // the correctness argument for the watermark: any commit racing past
    // a pre-scan claims ABOVE the pointer value the pre-scan read, so a
    // floor taken from latestVersion never hides a racer's fresh tag
    val floorThen = Snapshots.latestVersion(table).getOrElse(0)
    Snapshots.commitAppend(Seq((4L, "d")).toDF("id", "s"), table, Some("batch-3")) // racer
    assert(Snapshots.taggedVersionAbove(table, "batch-3", floorThen).contains(4))
  }

  test("commitAppend retries across a concurrent commit instead of shadowing it") {
    val table = java.nio.file.Files.createTempDirectory("graft-snap-app-race").toString + "/t"
    Snapshots.commit(Seq((1L, "a")).toDF("id", "s"), table) // v=1
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // 4 appenders race from the same base; the CAS loop must serialize
    // them so the final version holds ALL appended rows (a lost append
    // would surface as a missing id)
    Await.result(Future.sequence((2 to 5).map(i => Future {
      Snapshots.commitAppend(Seq((i.toLong, s"r$i")).toDF("id", "s"), table,
        Some(s"app-$i"))
    })), 2.minutes)
    // CAS-failed claims discard and re-claim HIGHER numbers, so the final
    // version id may exceed 5 — the invariant is content, not numbering
    assert(Snapshots.latestVersion(table).exists(_ >= 5))
    assert(Snapshots.read(spark, table).select("id").as[Long].collect().toSet ==
      (1L to 5L).toSet)
  }

  test("commitAppend rolls a crashed tagged commit forward instead of losing the batch") {
    val table = java.nio.file.Files.createTempDirectory("graft-snap-roll").toString + "/t"
    Snapshots.commitAppend(Seq((1L, "a")).toDF("id", "s"), table, Some("batch-0")) // v=1
    // simulate a committer that died between the atomic v=2 rename and
    // the pointer publish: a complete tagged+based version dir, with
    // _latest still on v=1
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").write.parquet(s"$table/v=2")
    java.nio.file.Files.write(java.nio.file.Paths.get(table, "v=2", "_graft_tag"),
      "batch-1".getBytes("UTF-8"))
    java.nio.file.Files.write(java.nio.file.Paths.get(table, "v=2", "_graft_base"),
      "1".getBytes("UTF-8"))
    assert(Snapshots.latestVersion(table).contains(1))
    // the streaming replay re-delivers batch-1: the orphan must be
    // PUBLISHED (roll-forward), not silently returned unpublished — and
    // the replayed rows must not commit twice (99 never appears)
    val replay = Snapshots.commitAppend(Seq((99L, "dup")).toDF("id", "s"), table,
      Some("batch-1"))
    assert(replay == 2)
    assert(Snapshots.latestVersion(table).contains(2))
    assert(Snapshots.read(spark, table).select("id").as[Long].collect().toSet == Set(1L, 2L))
    // a second replay is now a plain in-chain no-op
    assert(Snapshots.commitAppend(Seq((98L, "x")).toDF("id", "s"), table, Some("batch-1")) == 2)
    assert(Snapshots.read(spark, table).select("id").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("commitAppend re-commits a replay whose orphan was raced past (stale carry-forward)") {
    val table = java.nio.file.Files.createTempDirectory("graft-snap-stale").toString + "/t"
    Snapshots.commitAppend(Seq((1L, "a")).toDF("id", "s"), table, Some("batch-0")) // v=1
    // crashed batch-1 orphan at v=2 (carry-forward of v=1 + its row)
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").write.parquet(s"$table/v=2")
    java.nio.file.Files.write(java.nio.file.Paths.get(table, "v=2", "_graft_tag"),
      "batch-1".getBytes("UTF-8"))
    java.nio.file.Files.write(java.nio.file.Paths.get(table, "v=2", "_graft_base"),
      "1".getBytes("UTF-8"))
    // before recovery runs, ANOTHER writer appends: claims v=3 (numbering
    // passes the orphan), carries from the published v=1, publishes
    val v3 = Snapshots.commitAppend(Seq((30L, "c")).toDF("id", "s"), table, Some("other"))
    assert(v3 == 3 && Snapshots.latestVersion(table).contains(3))
    // batch-1's replay: the orphan's carry-forward is stale (misses 30) —
    // publishing it would shadow the other writer. It must re-commit the
    // batch fresh on the new base instead; exactly-once for BOTH batches.
    val replay = Snapshots.commitAppend(Seq((2L, "b")).toDF("id", "s"), table, Some("batch-1"))
    assert(replay == 4, s"expected fresh v=4, got $replay")
    assert(Snapshots.read(spark, table).select("id").as[Long].collect().toSet ==
      Set(1L, 2L, 30L))
    // the stale orphan's data dir survives (pinned-reader safety) but its
    // idempotence record is cleared — a THIRD replay lands on the fresh
    // commit, not the orphan
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(table, "v=2")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(table, "v=2", "_graft_tag")))
    assert(Snapshots.commitAppend(Seq((2L, "b")).toDF("id", "s"), table, Some("batch-1")) == 4)
  }

  test("concurrent same-tag committers append exactly once (publish-lock tag re-check)") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val table = java.nio.file.Files.createTempDirectory("graft-snap-tagrace").toString + "/t"
    Snapshots.commitAppend(Seq(0L).toDF("id"), table, Some("batch-0")) // v=1
    // 6 committers race one batch id (a restarted streaming driver racing
    // its zombie original): the pre-claim tag scan alone can interleave
    // with another committer's publish so both pass the CAS — the
    // under-lock tag re-check must collapse them to ONE committed version
    val vs = Await.result(
      Future.sequence((1 to 6).map(_ => Future {
        Snapshots.commitAppend(Seq(100L).toDF("id"), table, Some("batch-1"))
      })), 2.minutes)
    assert(vs.toSet.size == 1, s"same-tag committers split across versions: $vs")
    val ids = Snapshots.read(spark, table).as[Long].collect().toSeq
    assert(ids.count(_ == 100L) == 1, s"batch rows duplicated: $ids")
    assert(ids.count(_ == 0L) == 1, s"base rows lost or duplicated: $ids")
    // the tag resolves to exactly the version every caller returned
    assert(Snapshots.taggedVersion(table, "batch-1").contains(vs.head))
  }

  test("taggedVersion: duplicate tags resolve to the chain member, else the smallest version") {
    val table = java.nio.file.Files.createTempDirectory("graft-snap-tagdup").toString + "/t"
    Snapshots.commitAppend(Seq(1L).toDF("id"), table, Some("b1")) // v=1, published
    // plant the SAME tag on a higher orphan directory (the transient
    // duplicate a crashed replay can leave): the published-chain member
    // must win, never filesystem listing order
    Seq(9L).toDF("id").write.parquet(s"$table/v=3")
    java.nio.file.Files.write(java.nio.file.Paths.get(table, "v=3", "_graft_tag"),
      "b1".getBytes("UTF-8"))
    assert(Snapshots.taggedVersion(table, "b1").contains(1))
    // a tag on two UNPUBLISHED orphans: deterministic smallest-version pick
    Seq(8L).toDF("id").write.parquet(s"$table/v=6")
    Seq(7L).toDF("id").write.parquet(s"$table/v=4")
    java.nio.file.Files.write(java.nio.file.Paths.get(table, "v=6", "_graft_tag"),
      "tx".getBytes("UTF-8"))
    java.nio.file.Files.write(java.nio.file.Paths.get(table, "v=4", "_graft_tag"),
      "tx".getBytes("UTF-8"))
    assert(Snapshots.taggedVersion(table, "tx").contains(4))
  }

  test("rollbackTo restores old content as a NEW version; history stays immutable") {
    val table = java.nio.file.Files.createTempDirectory("graft-snaprb").toString + "/t"
    val v1 = Snapshots.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), table)
    val v2 = Snapshots.commit(Seq((1L, "a2")).toDF("id", "s"), table)
    val v3 = Snapshots.rollbackTo(table, v1)
    assert((v1, v2, v3) == (1, 2, 3))
    assert(Snapshots.latestVersion(table).contains(3))
    // latest = v1's content, carried forward (no data rewrite)
    assert(Snapshots.read(spark, table).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
    // the bad intermediate stays pinned-readable
    assert(Snapshots.read(spark, table, Some(2)).as[(Long, String)].collect().toSet ==
      Set((1L, "a2")))
    // rolling back to the published latest is a no-op
    assert(Snapshots.rollbackTo(table, 3) == 3)
    assert(Snapshots.latestVersion(table).contains(3))
    // unknown / unpublished versions fail loudly, never publish a claim
    intercept[IllegalArgumentException](Snapshots.rollbackTo(table, 9))
    // the restored chain keeps appending: base walking sees v3 as latest
    val v4 = Snapshots.commitAppend(Seq((5L, "e")).toDF("id", "s"), table)
    assert(v4 == 4)
    assert(Snapshots.read(spark, table).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (5L, "e")))
  }

  test("stale above-latest orphan: tag neutralized atomically, replay stays exactly-once") {
    import java.nio.charset.StandardCharsets
    import java.nio.file.{Files, Paths}
    val table = java.nio.file.Files.createTempDirectory("graft-snap-orph").toString + "/t"
    Snapshots.commit(Seq(1L).toDF("id"), table)  // v1
    Snapshots.commit(Seq(2L).toDF("id"), table)  // v2 published, latest=2
    // simulate a committer that claimed v=3 against base 1 and crashed
    // before its pointer publish, while v2 raced past it: a STALE orphan
    // whose carry-forward is outdated
    Seq(99L).toDF("id").write.parquet(s"$table/v=3")
    Files.write(Paths.get(table, "v=3", "_graft_tag"), "batch-b".getBytes(StandardCharsets.UTF_8))
    Files.write(Paths.get(table, "v=3", "_graft_base"), "1".getBytes(StandardCharsets.UTF_8))
    // the replayed batch must re-commit FRESH against the new base and
    // neutralize the orphan's tag in the same classification — leaving
    // it would put one tag on two versions
    val v = Snapshots.commitAppend(Seq(5L).toDF("id"), table, tag = Some("batch-b"))
    assert(v == 4 && Snapshots.latestVersion(table).contains(4))
    assert(!Files.exists(Paths.get(table, "v=3", "_graft_tag")))
    assert(Snapshots.read(spark, table).as[Long].collect().toSet == Set(2L, 5L))
    // a SECOND re-delivery is a pure no-op: without the neutralization it
    // could scan onto the stale orphan's tag and append the batch AGAIN
    assert(Snapshots.commitAppend(Seq(5L).toDF("id"), table, tag = Some("batch-b")) == 4)
    assert(Snapshots.latestVersion(table).contains(4))
    assert(Snapshots.read(spark, table).as[Long].collect().toSet == Set(2L, 5L))
  }

  test("rollbackTo refuses a crashed commit's unpublished orphan directory") {
    val table = java.nio.file.Files.createTempDirectory("graft-snap-orb").toString + "/t"
    Snapshots.commit(Seq(1L).toDF("id"), table)     // v1 published
    Seq(99L).toDF("id").write.parquet(s"$table/v=2") // orphan: claimed, never published
    Snapshots.commit(Seq(3L).toDF("id"), table)     // claims past the orphan → v3, latest
    assert(Snapshots.latestVersion(table).contains(3))
    // v=2's directory exists and 2 < latest, but its content was never
    // any published table state — restoring it would resurrect data no
    // reader ever saw
    val e = intercept[IllegalArgumentException](Snapshots.rollbackTo(table, 2))
    assert(e.getMessage.contains("never published"))
    // a genuinely published old version still restores
    assert(Snapshots.rollbackTo(table, 1) == 4)
    assert(Snapshots.read(spark, table).as[Long].collect().toSeq == Seq(1L))
  }

  test("readChanges: additions-only feed walks appends and dataChange=false rewrites") {
    import graft.sources.Compact
    val table = java.nio.file.Files.createTempDirectory("graft-snap-cdc").toString + "/t"
    val v1 = Snapshots.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), table)
    Snapshots.commitAppend(Seq((3L, "c")).toDF("id", "s"), table)
    // content-preserving compaction between the appends: the feed must
    // walk THROUGH it with an empty delta, not replay the whole table
    val (vc, _) = Compact.compactVersion(spark, table, targetBytes = 1L << 30)
    assert(vc == 3)
    Snapshots.commitAppend(Seq((4L, "d")).toDF("id", "s"), table)
    assert(Snapshots.readChanges(spark, table, v1).as[(Long, String)].collect().toSet ==
      Set((3L, "c"), (4L, "d")))
    // consuming from the maintenance version itself works
    assert(Snapshots.readChanges(spark, table, vc).as[(Long, String)].collect().toSet ==
      Set((4L, "d")))
    // from == to: an empty feed with the table's schema, not an error
    val empty = Snapshots.readChanges(spark, table, 4, toVersion = Some(4))
    assert(empty.count() == 0 && empty.columns.toSeq == Seq("id", "s"))
    // a full commit REPLACES the table: the interval's change is not
    // expressible as additions — loud failure, never a silent full replay
    Snapshots.commit(Seq((9L, "z")).toDF("id", "s"), table)
    val e = intercept[IllegalStateException](Snapshots.readChanges(spark, table, v1))
    assert(e.getMessage.contains("no delta manifest"))
    // ... and a rollback (content reversal) breaks the feed the same way
    val t2 = java.nio.file.Files.createTempDirectory("graft-snap-cdc2").toString + "/t"
    val w1 = Snapshots.commit(Seq(1L).toDF("id"), t2)
    Snapshots.commitAppend(Seq(2L).toDF("id"), t2)
    Snapshots.rollbackTo(t2, w1)
    intercept[IllegalStateException](Snapshots.readChanges(spark, t2, w1))
  }

  test("drop refuses the latest version, removes pinned history on request") {
    val table = java.nio.file.Files.createTempDirectory("graft-snap2").toString + "/t"
    Snapshots.commit(Seq(1L).toDF("id"), table)
    Snapshots.commit(Seq(2L).toDF("id"), table)
    intercept[IllegalArgumentException](Snapshots.drop(table, 2))
    assert(Snapshots.drop(table, 1))
    assert(!Snapshots.drop(table, 1)) // already gone
    assert(Snapshots.read(spark, table).as[Long].collect().toSeq == Seq(2L))
  }

  test("retainLast keeps the newest k; shared link bytes survive; crossed feeds fail loudly") {
    val table = java.nio.file.Files.createTempDirectory("graft-snap-ret").toString + "/t"
    Snapshots.commit(Seq(1L).toDF("id"), table)
    (2 to 5).foreach(i => Snapshots.commitAppend(Seq(i.toLong).toDF("id"), table))
    assert(Snapshots.retainLast(table, 2) == Seq(1, 2, 3))
    assert(Snapshots.retainLast(table, 2).isEmpty) // idempotent
    // the kept versions still read in full: carried hard links keep
    // shared bytes alive after their origin version was dropped
    assert(Snapshots.read(spark, table, Some(4)).as[Long].collect().toSet ==
      (1L to 4L).toSet)
    assert(Snapshots.read(spark, table).as[Long].collect().toSet == (1L to 5L).toSet)
    // a feed interval crossing a dropped version re-baselines loudly
    intercept[IllegalStateException](Snapshots.readChanges(spark, table, 2))
    // ... while an interval inside the retained window still serves
    assert(Snapshots.readChanges(spark, table, 4).as[Long].collect().toSeq == Seq(5L))
    intercept[IllegalArgumentException](Snapshots.retainLast(table, 0))
  }

  test("manifest carry: O(batch) appends read identically to Links appends at every version") {
    import graft.sources.Snapshots.CarryManifest
    val linksT = java.nio.file.Files.createTempDirectory("graft-snap-ml").toString + "/t"
    val manT = java.nio.file.Files.createTempDirectory("graft-snap-mm").toString + "/t"
    def rows(t: String, v: Int) =
      Snapshots.read(spark, t, Some(v)).as[(Long, String)].collect().toSet
    for (t <- Seq(linksT, manT)) Snapshots.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), t)
    Snapshots.commitAppend(Seq((3L, "c")).toDF("id", "s"), linksT)
    Snapshots.commitAppend(Seq((3L, "c")).toDF("id", "s"), manT, carry = CarryManifest)
    Snapshots.commitAppend(Seq((4L, "d")).toDF("id", "s"), linksT)
    Snapshots.commitAppend(Seq((4L, "d")).toDF("id", "s"), manT, carry = CarryManifest)
    (1 to 3).foreach(v => assert(rows(manT, v) == rows(linksT, v), s"v=$v diverged"))
    // the manifest version's own directory holds ONLY its batch (plus
    // markers) — the O(batch) claim, checked structurally
    def ownDataFiles(t: String, v: Int) =
      new java.io.File(s"$t/v=$v").listFiles()
        .count(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
    assert(ownDataFiles(manT, 3) < ownDataFiles(linksT, 3),
      "manifest append must not materialize inherited files")
    // CDF walks manifest appends exactly like Links appends
    assert(Snapshots.readChanges(spark, manT, 1).as[(Long, String)].collect().toSet ==
      Set((3L, "c"), (4L, "d")))
    // a Links append ON TOP of a manifest base re-materializes the
    // RESOLVED set (modes mix freely)
    Snapshots.commitAppend(Seq((5L, "e")).toDF("id", "s"), manT)
    assert(rows(manT, 4) == Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e")))
    // rollback to a manifest version materializes (the restored version
    // is independently retainable)
    val vr = Snapshots.rollbackTo(manT, 3)
    assert(rows(manT, vr) == Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
  }

  test("manifest carry retention: referenced versions refuse drop until compaction re-bases") {
    import graft.sources.{Compact, Snapshots}
    import graft.sources.Snapshots.CarryManifest
    val t = java.nio.file.Files.createTempDirectory("graft-snap-mr").toString + "/t"
    Snapshots.commit(Seq((1L, "a")).toDF("id", "s"), t)
    Snapshots.commitAppend(Seq((2L, "b")).toDF("id", "s"), t, carry = CarryManifest)
    Snapshots.commitAppend(Seq((3L, "c")).toDF("id", "s"), t, carry = CarryManifest)
    // v1's files are carried by v2 (and v3) — dropping it would break them
    val ex = intercept[IllegalArgumentException](Snapshots.drop(t, 1))
    assert(ex.getMessage.contains("carried by"), ex.getMessage)
    // retainLast skips referenced versions instead of failing the sweep
    assert(Snapshots.retainLast(t, 1).isEmpty)
    // compaction sees the RESOLVED set (3 rows), rewrites self-contained,
    // and re-bases the chain even though the file count is already small
    val (vc, _) = Compact.compactVersion(spark, t, targetBytes = 1L << 30)
    assert(vc == 4)
    assert(Snapshots.read(spark, t).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    // the feed walks the compaction's empty delta without re-baselining
    assert(Snapshots.readChanges(spark, t, 1).as[(Long, String)].collect().toSet ==
      Set((2L, "b"), (3L, "c")))
    // now retention reclaims the whole referenced chain (descending
    // sweep: v3 releases v2 releases v1), and the survivor still reads
    assert(Snapshots.retainLast(t, 1) == Seq(1, 2, 3))
    assert(Snapshots.read(spark, t).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("file:-scheme'd table runs the whole snapshot lifecycle through the Hadoop-backed io") {
    // the r17 store contract: commit, tagged append + exactly-once
    // replay, rollback, CDF, retention — all primitives (claim rename,
    // pointer-lock publish, carry-forward by copy, manifests) on the
    // Hadoop io instead of java.nio, exercised via the file: scheme
    val table = "file:" +
      java.nio.file.Files.createTempDirectory("graft-snap-fs").toString + "/t"
    val v1 = Snapshots.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), table)
    val v2 = Snapshots.commitAppend(Seq((3L, "c")).toDF("id", "s"), table,
      tag = Some("b-1"))
    assert((v1, v2) == (1, 2))
    // tagged replay is a no-op (exactly-once off the tag record)
    assert(Snapshots.commitAppend(Seq((3L, "dup")).toDF("id", "s"), table,
      tag = Some("b-1")) == v2)
    assert(Snapshots.read(spark, table).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    // pinned read + CDF off the scheme'd store
    assert(Snapshots.read(spark, table, Some(v1)).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
    assert(Snapshots.readChanges(spark, table, v1).as[(Long, String)].collect().toSet ==
      Set((3L, "c")))
    // rollback publishes a NEW carried-forward version; v2 stays pinned
    val v3 = Snapshots.rollbackTo(table, v1)
    assert(v3 == 3)
    assert(Snapshots.read(spark, table).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
    assert(Snapshots.read(spark, table, Some(v2)).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    // retention through the scheme'd io; the dropped version's feed
    // fails loudly, the survivors read in full
    assert(Snapshots.drop(table, v1))
    assert(Snapshots.read(spark, table, Some(v2)).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
  }
}
