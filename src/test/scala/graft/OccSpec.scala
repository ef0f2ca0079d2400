package graft

import java.nio.file.{Files, Paths}
import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.write.PhysicalWriteInfo
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.{DocStore, DocStoreBatchWrite, DocStoreCommitOps}

/** Writer-concurrency pins (r13 verdict item 5 — the Delta-OCC shape):
  * data work runs OUTSIDE the commit lock; the lock-held window is the
  * metadata arbitration only, O(staged + manifest lines), independent
  * of table file count (PART_SEQ claim) and history depth
  * (checkpoint-accelerated nextVersion). Two faces, both deterministic:
  * racing appends to disjoint slices ALL commit (they merge — no
  * conflict, no retry), and TRUE conflicts (concurrent identity
  * assignment; a REPLACE WHERE whose window a concurrent append
  * straddled) refuse loudly. */
class OccSpec extends SparkSpec {

  private def freshTable(name: String): (org.apache.spark.sql.SparkSession, String, String) = {
    val root = Files.createTempDirectory(name).toString
    val cat = name.replace('-', '_')
    val sc = graft.core.Sessions.scoped(spark,
      s"spark.sql.catalog.$cat" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      s"spark.sql.catalog.$cat.root" -> root)
    sc.sql(s"CREATE NAMESPACE $cat.ns")
    sc.sql(s"CREATE TABLE $cat.ns.t (doc_id BIGINT NOT NULL, " +
      "n_chars BIGINT, lang STRING, source STRING, text STRING)")
    (sc, cat, Paths.get(root, "ns", "t").toString)
  }

  test("N racing appends to disjoint slices all commit; segments merge, names never collide") {
    val (sc, cat, path) = freshTable("occ-append")
    val n = 8
    val futures = (0 until n).map { k =>
      Future {
        sc.sql(s"INSERT INTO $cat.ns.t SELECT id + ${k * 1000}, id, " +
          s"'l$k', 's', 'txt' FROM RANGE(50)")
      }
    }
    // every append must succeed — disjoint appends MERGE under the
    // commit arbitration, they never conflict or refuse. The bound is
    // deliberately generous (r14 advice): under a loaded CI box the 8
    // INSERTs share one local scheduler and can serialize; a timeout
    // here would be a scheduling flake, not an arbitration failure —
    // every assertion below is order-independent and exact once all
    // futures complete.
    Await.result(Future.sequence(futures), 600.seconds)
    val total = sc.sql(s"SELECT COUNT(*), COUNT(DISTINCT doc_id) " +
      s"FROM $cat.ns.t").head
    assert(total.getLong(0) == n * 50L && total.getLong(1) == n * 50L)
    val segs = DocStore.readManifest(path).map(_.name)
    assert(segs.distinct.size == segs.size, s"name collision: $segs")
    assert(segs.size >= n, segs.toString)
    // every commit is a version; history arbitration held under race
    assert(DocStoreCommitOps.nextVersion(path) == n + 1L)
    // the sequence file is maintained and past every name on disk
    val seq = Files.readString(Paths.get(path, DocStoreCommitOps.PART_SEQ_FILE))
      .trim.toInt
    val maxOnDisk = segs.flatMap("part-(\\d+)\\.gds".r
      .findFirstMatchIn(_)).map(_.group(1).toInt)
    assert(seq > maxOnDisk.max, s"PART_SEQ $seq <= disk max $maxOnDisk")
  }

  // -------- low-level deterministic writers (the DSv2 objects Spark
  // -------- drives; driving them directly makes the interleaving exact)

  private val order = Array(0, 1, 2, 3, 4)

  private def writeInfo(parts: Int): PhysicalWriteInfo =
    new PhysicalWriteInfo { override def numPartitions(): Int = parts }

  private def row(id: java.lang.Long, chars: Long): InternalRow =
    new GenericInternalRow(Array[Any](
      if (id == null) null else id.longValue(), chars,
      UTF8String.fromString("en"), UTF8String.fromString("s"),
      UTF8String.fromString("t")))

  private def stage(w: DocStoreBatchWrite, rows: Seq[InternalRow],
      parts: Int = 1): Array[org.apache.spark.sql.connector.write.WriterCommitMessage] = {
    val f = w.createBatchWriterFactory(writeInfo(parts))
    val dw = f.createWriter(0, 0L)
    rows.foreach(dw.write)
    Array(dw.commit())
  }

  test("true conflict: concurrent identity assignment refuses loudly at commit") {
    val dir = Files.createTempDirectory("occ-ident").toString
    val mb = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong(DocStore.IDENTITY_START_KEY, 1L)
      .putLong(DocStore.IDENTITY_STEP_KEY, 1L)
      .putBoolean(DocStore.IDENTITY_EXPLICIT_KEY, false)
    val schema = org.apache.spark.sql.types.StructType(
      DocStore.SCHEMA.fields.toSeq.updated(0,
        DocStore.SCHEMA.fields(0).copy(nullable = true,
          metadata = mb.build())))
    val spec = DocStore.identityOf(schema).get
    // the published watermark advance resolves the spec from the
    // TABLE's schema file — persist it exactly as the catalog does
    DocStore.writeSchemaFile(dir, schema)
    def writer() = new DocStoreBatchWrite(dir, schema, order, urand(),
      truncate = false, identity = Some(spec))
    val w1 = writer()
    val w2 = writer()
    // both plan against the SAME identity high water…
    val m1 = stage(w1, Seq(row(null, 1L)))
    val m2 = stage(w2, Seq(row(null, 2L)))
    // …first commit wins and advances it; the second detects the move
    // and refuses (its stripes may collide), dropping its staged files
    w1.commit(m1)
    val e = intercept[IllegalStateException] { w2.commit(m2) }
    assert(e.getMessage.contains("concurrent identity write"), e.getMessage)
    assert(DocStore.readManifest(dir).map(_.rows).sum == 1L)
    // the refused writer's staged files are gone (no orphan leak)
    val stream = Files.list(Paths.get(dir))
    val staged = try {
      import scala.jdk.CollectionConverters._
      stream.iterator().asScala
        .count(_.getFileName.toString.startsWith(".stg-"))
    } finally stream.close()
    assert(staged == 0, s"$staged staged files leaked")
  }

  test("true conflict: REPLACE WHERE refuses when a concurrent append straddles its window") {
    val dir = Files.createTempDirectory("occ-repl").toString
    def writer(replace: Option[(Long, Long)]) =
      new DocStoreBatchWrite(dir, DocStore.SCHEMA, order, urand(),
        truncate = false, replaceWindow = replace)
    // seed a segment fully inside [0, 100]
    val seedW = writer(None)
    seedW.commit(stage(seedW, Seq(row(10L, 1L), row(20L, 2L))))
    // replacer plans against that state and stages its replacement…
    val rw = writer(Some((0L, 100L)))
    val rm = stage(rw, Seq(row(30L, 3L)))
    // …but a concurrent append lands a segment STRADDLING the window
    val aw = writer(None)
    aw.commit(stage(aw, Seq(row(90L, 9L), row(150L, 15L))))
    // the replace re-reads under the lock, sees the misaligned segment,
    // refuses loudly, and leaves the table exactly as the append made it
    val e = intercept[IllegalStateException] { rw.commit(rm) }
    assert(e.getMessage.contains("not segment-aligned"), e.getMessage)
    assert(DocStore.readManifest(dir).map(_.rows).sum == 4L)
  }

  test("nextVersion probes past a checkpoint gap (crash between manifest move and checkpoint append)") {
    val (sc, cat, path) = freshTable("occ-ckpt")
    sc.sql(s"INSERT INTO $cat.ns.t VALUES (1, 1, 'en', 's', 'a')")
    sc.sql(s"INSERT INTO $cat.ns.t VALUES (2, 2, 'en', 's', 'b')")
    assert(DocStoreCommitOps.nextVersion(path) == 3L)
    // simulate the crash: a manifest snapshot EXISTS that the
    // checkpoint never covered — the forward probe must step past it
    Files.copy(Paths.get(path, "MANIFEST.v2"), Paths.get(path, "MANIFEST.v3"))
    assert(DocStoreCommitOps.nextVersion(path) == 4L)
  }

  private def urand(): String =
    java.util.UUID.randomUUID().toString.take(8)

  test("MoR MERGE claims one part number per staged insert segment (r14 regression pin)") {
    val (sc, cat, path) = freshTable("occ-mor-claim")
    sc.sql(s"CREATE TABLE $cat.ns.m (doc_id BIGINT NOT NULL, " +
      "n_chars BIGINT, lang STRING, source STRING, text STRING) " +
      "TBLPROPERTIES ('graft.rowlevel.mode' = 'merge-on-read')")
    sc.sql(s"INSERT INTO $cat.ns.m VALUES (1, 1, 'en', 's', 'seed')")
    // a MERGE whose not-matched inserts stage across MULTIPLE tasks —
    // the PART_SEQ claim must cover every staged segment, or the next
    // commit re-claims a used number and refuses to overwrite
    sc.sql(s"SELECT id + 100 AS doc_id, id AS n_chars, 'xx' AS lang, " +
      "'s' AS source, 'merged' AS text FROM RANGE(200)")
      .repartition(4).createOrReplaceTempView("occ_mor_src")
    sc.sql(s"MERGE INTO $cat.ns.m t USING occ_mor_src s " +
      "ON t.doc_id = s.doc_id " +
      "WHEN NOT MATCHED THEN INSERT *")
    // subsequent commits land with fresh names — no overwrite refusal
    sc.sql(s"INSERT INTO $cat.ns.m VALUES (2, 2, 'en', 's', 'after1')")
    sc.sql(s"INSERT INTO $cat.ns.m VALUES (3, 3, 'en', 's', 'after2')")
    assert(sc.sql(s"SELECT COUNT(*) FROM $cat.ns.m").head.getLong(0) == 203L)
    val mpath = Paths.get(path).getParent.resolve("m").toString
    val names = graft.sources.DocStore.readManifest(mpath).map(_.name)
    assert(names.distinct.size == names.size, names.toString)
  }

  test("fencing: a holder stolen from past the TTL cannot publish over the stealer") {
    val (sc, cat, path) = freshTable("occ-fence")
    sc.sql(s"INSERT INTO $cat.ns.t VALUES (1, 1, 'en', 's', 'seed')")
    // The stalled committer: takes the lock, then (simulating a 10-min
    // GC pause) its lock ages past the steal TTL while a concurrent
    // writer arbitrates. When it wakes and publishes, the fence must
    // refuse — exactly one of the two commits wins the manifest.
    val e = intercept[IllegalStateException] {
      DocStoreCommitOps.withCommitLock(path) {
        val lock = Paths.get(path, ".COMMIT_LOCK")
        Files.setLastModifiedTime(lock,
          java.nio.file.attribute.FileTime.fromMillis(
            System.currentTimeMillis() -
              DocStoreCommitOps.LOCK_STEAL_TTL_MS - 60000L))
        // the stealer runs on ANOTHER thread (its own fence context)
        // and commits a full catalog INSERT through the stolen lock
        val stealer = new Thread(() =>
          sc.sql(s"INSERT INTO $cat.ns.t VALUES (2, 2, 'en', 's', 'won')"))
        stealer.start()
        stealer.join(600000L)
        assert(!stealer.isAlive, "stealer never finished")
        // the woken holder now tries to publish its (stale) view
        val (segs, dvs) = DocStore.readManifestAndDeletes(path)
        DocStoreCommitOps.writeManifest(path, segs, urand(), dvs)
      }
    }
    assert(e.getMessage.contains("fencing violation"), e.getMessage)
    // the stealer's commit is live and intact; no torn or doubled state
    val rows = sc.sql(s"SELECT doc_id, text FROM $cat.ns.t ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((1L, "seed"), (2L, "won")), rows.toString)
    // and the loser's stale temp manifest never became live: the live
    // manifest still lists BOTH rows' segments
    assert(DocStore.readManifest(path).map(_.rows).sum == 2L)
    // the stealer released cleanly: a fresh commit proceeds normally
    sc.sql(s"INSERT INTO $cat.ns.t VALUES (3, 3, 'en', 's', 'after')")
    assert(sc.sql(s"SELECT COUNT(*) FROM $cat.ns.t").head.getLong(0) == 3L)
  }

  test("fencing: release leaves a stolen lock in place for its new owner") {
    val (sc, cat, path) = freshTable("occ-fence-rel")
    sc.sql(s"INSERT INTO $cat.ns.t VALUES (1, 1, 'en', 's', 'seed')")
    val lock = Paths.get(path, ".COMMIT_LOCK")
    DocStoreCommitOps.withCommitLock(path) {
      // age + steal happens while we "stall"; by the time our finally
      // runs, the lock belongs to someone else and must survive us
      Files.setLastModifiedTime(lock,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() -
            DocStoreCommitOps.LOCK_STEAL_TTL_MS - 60000L))
      val t = new Thread(() =>
        DocStoreCommitOps.withCommitLock(path) {
          // the new owner holds the lock long enough for the stalled
          // holder's release to observe the foreign token
          Files.setLastModifiedTime(lock,
            java.nio.file.attribute.FileTime.fromMillis(
              System.currentTimeMillis()))
          // park the fresh lock on disk: exit WITHOUT releasing by
          // moving it aside and back is not possible atomically here,
          // so instead verify from the stalled holder's side below
        })
      t.start(); t.join(600000L)
      assert(!t.isAlive)
      // the stealer acquired with a fresh token and released cleanly;
      // our own release below must NOT throw or delete a reacquired
      // lock. Reacquire as a third party to leave a foreign lock live:
      Files.createDirectory(lock)
      Files.createFile(lock.resolve(
        DocStoreCommitOps.LOCK_TOKEN_PREFIX + "third-party-owner"))
    }
    // the stalled holder's finally ran: the foreign lock is untouched
    assert(Files.exists(lock), "release deleted a lock it no longer owned")
    assert(Files.exists(lock.resolve(
      DocStoreCommitOps.LOCK_TOKEN_PREFIX + "third-party-owner")),
      "release removed a foreign owner's token")
    graft.core.Fs.deleteRecursively(lock)
  }
}
