package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.sources.{DocStoreBranches, DocStoreCommitOps}

/** Branch refs + write-audit-publish on the docstore catalog: branch
  * writes are invisible to main (no version, no CDC) until a
  * fast-forward publish lands them as ONE commit; publish refuses when
  * main moved (content-hash check); drop reclaims branch-only files;
  * the reclaimers treat branch manifests as liveness roots. */
class BranchSpec extends SparkSpec {

  private def freshCat(name: String): (SparkSession, String) = {
    val root = Files.createTempDirectory(s"branch-$name").toString
    val s = graft.core.Sessions.scoped(spark,
      s"spark.sql.catalog.$name" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      s"spark.sql.catalog.$name.root" -> root)
    s.sql(s"CREATE NAMESPACE IF NOT EXISTS $name.default")
    s.sql(s"CREATE TABLE $name.default.t (doc_id BIGINT NOT NULL, " +
      "n_chars BIGINT, lang STRING, source STRING, text STRING)")
    s.sql(s"INSERT INTO $name.default.t VALUES " +
      "(1, 10, 'pt', 'web', 'a'), (2, 20, 'en', 'web', 'b')")
    (s, Paths.get(root, "default", "t").toString)
  }

  private def wapSession(s: SparkSession, branch: String): SparkSession =
    graft.core.Sessions.scoped(s, "spark.graft.wap.branch" -> branch)

  test("write-audit-publish: branch writes invisible until one-commit publish") {
    val (s, path) = freshCat("bwap")
    s.sql("CALL bwap.system.create_branch('default.t', 'audit')")
    val vBefore = DocStoreCommitOps.nextVersion(path) - 1

    val w = wapSession(s, "audit")
    w.sql("INSERT INTO bwap.default.t VALUES (3, 30, 'de', 'web', 'c')")
    w.sql("INSERT INTO bwap.default.t VALUES (4, 40, 'fr', 'web', 'd')")

    // main face: unchanged rows, unchanged version history, CDC-silent
    assert(s.sql("SELECT COUNT(*) FROM bwap.default.t").head.getLong(0) == 2)
    assert(DocStoreCommitOps.nextVersion(path) - 1 == vBefore,
      "branch commits must create no main versions")
    // audit reads: the WAP session sees staged rows; so does a plain
    // session via VERSION AS OF '<branch>'
    assert(w.sql("SELECT COUNT(*) FROM bwap.default.t").head.getLong(0) == 4)
    assert(s.sql(
      "SELECT COUNT(*) FROM bwap.default.t VERSION AS OF 'audit'")
      .head.getLong(0) == 4)

    val pub = s.sql(
      "CALL bwap.system.publish_branch('default.t', 'audit')").head
    assert(pub.getLong(1) == vBefore + 1, "publish is ONE commit")
    assert(s.sql("SELECT COUNT(*) FROM bwap.default.t").head.getLong(0) == 4)
    assert(!DocStoreBranches.exists(path, "audit"), "refs dropped")
    // the published commit carries BOTH staged inserts
    val prev = s.sql(
      s"SELECT COUNT(*) FROM bwap.default.t VERSION AS OF $vBefore")
      .head.getLong(0)
    assert(prev == 2, "pre-publish snapshot unchanged")
  }

  test("branch streams: tombstone lifecycle — publish resumes on main, drop/unknown refuse") {
    val (s, path) = freshCat("bstr")
    // unknown branch fails loudly on both faces
    assert(intercept[Exception] {
      s.read.format("graft-docstore").option("path", path)
        .option("branch", "nope").load().count()
    }.getMessage.contains("no branch 'nope'"))
    // branch + manifest are mutually exclusive
    assert(intercept[Exception] {
      s.read.format("graft-docstore").option("path", path)
        .option("branch", "x").option("manifest", "MANIFEST.v1").load()
    }.getMessage.contains("not both"))
    // CDC never sees a branch
    assert(intercept[Exception] {
      s.read.format("graft-docstore").option("path", path)
        .option("readChangeFeed", "true").option("branch", "x").load()
    }.getMessage.contains("MAIN commits only"))
    s.sql("CALL bstr.system.create_branch('default.t', 'audit')")
    wapSession(s, "audit").sql(
      "INSERT INTO bstr.default.t VALUES (3, 30, 'de', 'web', 'c')")
    // batch read of the branch face sees base + staged
    assert(s.read.format("graft-docstore").option("path", path)
      .option("branch", "audit").load().count() == 3)
    s.sql("CALL bstr.system.publish_branch('default.t', 'audit')")
    // published: the face resolves to main (tombstone), counts agree
    assert(Files.exists(Paths.get(path,
      DocStoreBranches.publishedMarker("audit"))))
    assert(s.read.format("graft-docstore").option("path", path)
      .option("branch", "audit").load().count() == 3)
    // re-create clears the stale tombstone; a later DROP then refuses
    // the face (dropped data is gone — silent main reads would lie)
    s.sql("CALL bstr.system.create_branch('default.t', 'audit')")
    assert(!Files.exists(Paths.get(path,
      DocStoreBranches.publishedMarker("audit"))))
    s.sql("CALL bstr.system.drop_branch('default.t', 'audit')")
    assert(intercept[Exception] {
      s.read.format("graft-docstore").option("path", path)
        .option("branch", "audit").load().count()
    }.getMessage.contains("no branch 'audit'"))
  }

  test("identity assignment on a branch shares the table watermark with main") {
    val root = Files.createTempDirectory("branch-ident").toString
    val s = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.bid" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.bid.root" -> root)
    s.sql("CREATE NAMESPACE bid.default")
    s.sql("CREATE TABLE bid.default.t (doc_id BIGINT GENERATED ALWAYS " +
      "AS IDENTITY, n_chars BIGINT, lang STRING, source STRING, text STRING)")
    s.sql("INSERT INTO bid.default.t (n_chars, lang, source, text) " +
      "VALUES (1, 'a', 'w', 'x')")
    s.sql("CALL bid.system.create_branch('default.t', 'audit')")
    // branch staging assigns THROUGH the shared watermark (the commit
    // hook runs for branch manifests too), so a concurrent main write
    // can never collide with branch-staged ids — and vice versa
    wapSession(s, "audit").sql(
      "INSERT INTO bid.default.t (n_chars, lang, source, text) " +
        "VALUES (2, 'b', 'w', 'y')")
    s.sql("INSERT INTO bid.default.t (n_chars, lang, source, text) " +
      "VALUES (3, 'c', 'w', 'z')")
    // (publishing now would rightly refuse — main moved — but the ids
    // handed out on the two faces must STILL be disjoint: that is the
    // shared watermark's guarantee)
    val mainIds = s.sql("SELECT doc_id FROM bid.default.t").collect()
      .map(_.getLong(0)).toSet
    val branchIds = s.sql(
      "SELECT doc_id FROM bid.default.t VERSION AS OF 'audit'").collect()
      .map(_.getLong(0)).toSet
    assert(mainIds.size == 2 && branchIds.size == 2 &&
      (mainIds ++ branchIds).size == 3,
      s"branch and main identity assignments must never collide: " +
        s"main=$mainIds branch=$branchIds")
  }

  test("publish refuses after main moved; re-cut branch publishes") {
    val (s, path) = freshCat("bff")
    s.sql("CALL bff.system.create_branch('default.t', 'b')")
    wapSession(s, "b").sql(
      "INSERT INTO bff.default.t VALUES (3, 30, 'de', 'web', 'c')")
    // main moves AFTER the branch was cut
    s.sql("INSERT INTO bff.default.t VALUES (9, 90, 'it', 'web', 'z')")
    val e = intercept[Exception] {
      s.sql("CALL bff.system.publish_branch('default.t', 'b')")
    }
    assert(e.getMessage.contains("fast-forward"), e.getMessage)
    assert(DocStoreBranches.exists(path, "b"), "refused publish keeps refs")
    // drop reclaims the branch-only segment; main rows intact
    val d = s.sql("CALL bff.system.drop_branch('default.t', 'b')").head
    assert(d.getLong(0) == 1, "exactly the branch-only segment deleted")
    assert(s.sql("SELECT COUNT(*) FROM bff.default.t").head.getLong(0) == 3)
  }

  test("wap conf with a missing branch refuses loudly") {
    val (s, _) = freshCat("bmiss")
    val w = wapSession(s, "nope")
    val e = intercept[Exception] {
      w.sql("SELECT COUNT(*) FROM bmiss.default.t").collect()
    }
    assert(e.getMessage.contains("create_branch"), e.getMessage)
  }

  test("TRUNCATE and branch-face row-level ops refuse; vacuum keeps branch segments") {
    val (s, path) = freshCat("bguard")
    s.sql("CALL bguard.system.create_branch('default.t', 'stage')")
    val w = wapSession(s, "stage")
    w.sql("INSERT INTO bguard.default.t VALUES (3, 30, 'de', 'web', 'c')")

    val t = intercept[Exception] { s.sql("TRUNCATE TABLE bguard.default.t") }
    assert(t.getMessage.contains("unpublished branches"), t.getMessage)
    val del = intercept[Exception] {
      w.sql("DELETE FROM bguard.default.t WHERE lang = 'de'")
    }
    assert(del.getMessage.toLowerCase.contains("branch"), del.getMessage)
    val ow = intercept[Exception] {
      w.sql("INSERT OVERWRITE bguard.default.t " +
        "VALUES (7, 70, 'pt', 'web', 'x')")
    }
    assert(ow.getMessage.contains("branch"), ow.getMessage)

    // vacuum with a live branch must treat its segments as live
    s.sql("CALL bguard.system.vacuum('default.t')")
    assert(w.sql("SELECT COUNT(*) FROM bguard.default.t").head.getLong(0) == 3,
      "vacuum must not reclaim unpublished branch segments")
    s.sql("CALL bguard.system.publish_branch('default.t', 'stage')")
    assert(s.sql("SELECT COUNT(*) FROM bguard.default.t").head.getLong(0) == 3)
  }

  test("ADVICE r13: publish crash between fast-forward and marker recovers, not refuses") {
    val (s, path) = freshCat("bcrash")
    s.sql("CALL bcrash.system.create_branch('default.t', 'stage')")
    val w = wapSession(s, "stage")
    w.sql("INSERT INTO bcrash.default.t VALUES (3, 30, 'de', 'web', 'c')")
    val vBefore = DocStoreCommitOps.nextVersion(path) - 1
    // simulate the crash: the fast-forward manifest write landed (main
    // holds the branch content, snapshot included) but the process died
    // before the PUBLISHED marker move — refs present, no marker
    val bm = DocStoreBranches.manifestName("stage")
    val (segs, dvs) = graft.sources.DocStore.readManifestAndDeletes(path, bm)
    val txns = graft.sources.DocStore.readTxns(path, bm)
    DocStoreCommitOps.writeManifest(path, segs, "crash-sim", dvs,
      newTxns = txns)
    assert(!Files.exists(
      Paths.get(path, DocStoreBranches.publishedMarker("stage"))))
    // re-running publish must complete the interrupted one (cleanup +
    // marker + the SAME version), not refuse with "main moved"
    val pub = s.sql(
      "CALL bcrash.system.publish_branch('default.t', 'stage')").head
    assert(pub.getLong(1) == vBefore + 1, pub.toString)
    assert(s.sql("SELECT COUNT(*) FROM bcrash.default.t")
      .head.getLong(0) == 3)
    assert(!DocStoreBranches.exists(path, "stage"), "refs cleaned up")
    assert(Files.readString(Paths.get(path,
      DocStoreBranches.publishedMarker("stage"))).trim.toLong == vBefore + 1,
      "marker records the published version for branch-face streams")

    // deeper crash: died INSIDE writeManifest after the MANIFEST move
    // but before the retained snapshot copy — recovery completes the
    // snapshot so time travel serves the published commit
    s.sql("CALL bcrash.system.create_branch('default.t', 'stage2')")
    val w2 = wapSession(s, "stage2")
    w2.sql("INSERT INTO bcrash.default.t VALUES (4, 40, 'fr', 'web', 'd')")
    Files.copy(Paths.get(path, DocStoreBranches.manifestName("stage2")),
      Paths.get(path, "MANIFEST"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val pub2 = s.sql(
      "CALL bcrash.system.publish_branch('default.t', 'stage2')").head
    assert(pub2.getLong(1) == vBefore + 2, pub2.toString)
    assert(s.sql("SELECT COUNT(*) FROM bcrash.default.t")
      .head.getLong(0) == 4)
    assert(s.sql("SELECT COUNT(*) FROM bcrash.default.t VERSION AS OF " +
      (vBefore + 2)).head.getLong(0) == 4)

    // recovery must NOT swallow a legitimate no-commit publish: a
    // branch with no staged writes still publishes as a NEW, auditable
    // fast-forward commit (r13 review finding)
    s.sql("CALL bcrash.system.create_branch('default.t', 'empty')")
    val pub3 = s.sql(
      "CALL bcrash.system.publish_branch('default.t', 'empty')").head
    assert(pub3.getLong(1) == vBefore + 3, pub3.toString)
  }
}
