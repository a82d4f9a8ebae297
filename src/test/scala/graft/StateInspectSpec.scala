package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{AppendTable, BucketedTable, SnapshotTable,
  StateInspect}

/** The fsck/describe contract: a healthy table of every layout
  * reports zero issues with truthful facts (auto-detected layout),
  * and each injected breakage class surfaces as a NAMED issue —
  * while crash leftovers (orphans, stale side files) stay facts,
  * never false alarms.
  */
class StateInspectSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def toDF(xs: Seq[Long]) = {
    val s = spark; import s.implicits._
    xs.toDF("x")
  }
  private def kvDF(xs: Seq[(Long, Long)]) = {
    val s = spark; import s.implicits._
    xs.toDF("k", "v")
  }
  private def rm(p: String): Unit =
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))

  test("append log: healthy facts, crash leftovers stay facts, real breakage is a named issue") {
    val root = Files.createTempDirectory("fsck_append").toString
    val t = new AppendTable(spark, s"$root/t", statsCol = Some("x"))
    t.append(toDF(Seq(1L, 2L)), 0L)
    t.append(toDF(Seq(3L)), 1L)
    t.compact()
    t.append(toDF(Seq(4L)), 2L)
    t.deleteKeysVectored(toDF(Seq(2L)), "x")
    val r = StateInspect.inspect(spark, s"$root/t")
    assert(r.layout == "append" && r.healthy, r.render)
    assert(r.facts("last_batch_id") == "2" &&
      r.facts("compacted_through") == "1" &&
      r.facts("tombstone_generation") == "1" &&
      r.facts("tombstone_rows") == "1" &&
      r.facts("read_fan_in") == "2", r.render)
    // a crash orphan (future batch dir) is a FACT, not an issue
    toDF(Seq(9L)).write.parquet(s"$root/t/b_9")
    val r2 = StateInspect.inspect(spark, s"$root/t")
    assert(r2.healthy && r2.facts("orphan_batch_dirs") == "1", r2.render)
    // losing the live tombstone generation breaks every read: named
    rm(s"$root/t/t_1")
    val r3 = StateInspect.inspect(spark, s"$root/t")
    assert(r3.issues.exists(_.contains("tombstone generation t_1")),
      r3.render)
    // losing the live consolidated dir breaks the compacted history
    rm(s"$root/t/k_1")
    val r4 = StateInspect.inspect(spark, s"$root/t")
    assert(r4.issues.exists(_.contains("consolidated dir k_1")), r4.render)
    rm(root)
  }

  test("bucketed store: healthy through migrate/tag/vacuum; missing bucket dir, schema file, and vacuumed-tag breakages are named") {
    val root = Files.createTempDirectory("fsck_bucketed").toString
    val t = new BucketedTable(spark, s"$root/t", "k", 4)
    t.merge(kvDF((0L until 12L).map(k => (k, k))), 0L)
    t.addColumn("tag_col", "string", "'x'")
    t.merge(kvDF(Seq(3L -> 30L)), 1L)
    t.tag("train-v0", 0L)
    t.vacuum(keepVersions = 1)
    val r = StateInspect.inspect(spark, s"$root/t")
    assert(r.layout == "bucketed" && r.healthy, r.render)
    assert(r.facts("live_version") == "1" &&
      r.facts("schema_version") == "1" &&
      r.facts("retained_versions").contains("0") &&
      r.facts("tags") == "[train-v0->0]", r.render)
    // a tag pinning a no-longer-retained version is named: fake one
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/t/tag_ghost"),
      "99".getBytes("UTF-8"))
    val r2 = StateInspect.inspect(spark, s"$root/t")
    assert(r2.issues.exists(i => i.contains("'ghost'") &&
      i.contains("not fully retained")), r2.render)
    rm(s"$root/t/tag_ghost")
    // a missing schema side file is named
    val schemaBak = Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/t/columns_v1"))
    rm(s"$root/t/columns_v1")
    val r3 = StateInspect.inspect(spark, s"$root/t")
    assert(r3.issues.exists(_.contains("columns_v1")), r3.render)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/t/columns_v1"), schemaBak)
    // a missing referenced bucket dir is named with the dir list
    val manifest = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/t/manifest_v1")), "UTF-8")
    val victim = manifest.linesIterator.next().split(",", 2)(1)
    rm(s"$root/t/$victim")
    val r4 = StateInspect.inspect(spark, s"$root/t")
    assert(r4.issues.exists(_.contains(victim)), r4.render)
    rm(root)
  }

  test("snapshot table: healthy facts; losing the live snapshot is named") {
    val root = Files.createTempDirectory("fsck_snapshot").toString
    val t = new SnapshotTable(spark, s"$root/t")
    t.commit(toDF(Seq(1L)), 0L)
    t.commit(toDF(Seq(2L)), 1L)
    t.tag("pin", 0L)
    val r = StateInspect.inspect(spark, s"$root/t")
    assert(r.layout == "snapshot" && r.healthy, r.render)
    assert(r.facts("live_version") == "1" &&
      r.facts("tags") == "[pin->0]", r.render)
    rm(s"$root/t/v_1")
    val r2 = StateInspect.inspect(spark, s"$root/t")
    assert(r2.issues.exists(_.contains("v_1 missing")), r2.render)
    rm(root)
  }

  test("bucketed zone maps: live zones_v is a counted fact when healthy, a named issue when garbled (range reads would fail), absent = conservative") {
    val root = Files.createTempDirectory("fsck_zones").toString
    val t = new BucketedTable(spark, s"$root/t", "k", 4,
      statsCol = Some("v"))
    t.merge(kvDF((0L until 12L).map(k => (k, k * 10L))), 0L)
    val r = StateInspect.inspect(spark, s"$root/t")
    assert(r.healthy && r.facts("zone_buckets") == "4", r.render)
    val body = Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/t/zones_v0"))
    Files.write(java.nio.file.Paths.get(s"$root/t/zones_v0"),
      "0,garbled".getBytes("UTF-8"))
    val r2 = StateInspect.inspect(spark, s"$root/t")
    assert(r2.facts("zone_buckets") == "unparseable" &&
      r2.issues.exists(_.contains("zones_v0 unparseable")), r2.render)
    Files.write(java.nio.file.Paths.get(s"$root/t/zones_v0"), body)
    // a table with no declared stats column reports absent, no issue
    val t2 = new BucketedTable(spark, s"$root/u", "k", 4)
    t2.merge(kvDF(Seq(1L -> 10L)), 0L)
    val r3 = StateInspect.inspect(spark, s"$root/u")
    assert(r3.healthy && r3.facts("zone_buckets") == "absent", r3.render)
    rm(root)
  }

  test("repair sweeps exactly the read-invisible residue on all three layouts; reads byte-identical; idempotent") {
    // append log: orphan future batch + stale consolidated + stale
    // zone + tmp residue planted around a live (compacted+vectored)
    // table — repair removes all four, the read is unchanged, the
    // facts zero out, and a second run removes nothing
    val rootA = Files.createTempDirectory("repair_append").toString
    val ta = new AppendTable(spark, s"$rootA/t", statsCol = Some("x"))
    ta.append(toDF(Seq(1L, 2L)), 0L)
    ta.append(toDF(Seq(3L)), 1L)
    ta.compact()
    ta.append(toDF(Seq(4L)), 2L)
    ta.deleteKeysVectored(toDF(Seq(2L)), "x")
    val preA = ta.read().get.collect().map(_.getLong(0)).sorted.toSeq
    toDF(Seq(9L)).write.parquet(s"$rootA/t/b_9")           // crash orphan
    toDF(Seq(8L)).write.parquet(s"$rootA/t/k_0")           // stale consolidated
    Files.write(java.nio.file.Paths.get(s"$rootA/t/k_0.zone"),
      "8,8".getBytes("UTF-8"))                             // its zone
    Files.write(java.nio.file.Paths.get(s"$rootA/t/_LATEST.tmp.7"),
      "junk".getBytes("UTF-8"))                            // tmp residue
    val ra = StateInspect.repair(spark, s"$rootA/t")
    assert(ra.removed.toSet == Set("b_9", "k_0", "k_0.zone",
      "_LATEST.tmp.7"), ra.render)
    assert(ta.read().get.collect().map(_.getLong(0)).sorted.toSeq == preA)
    assert(ra.report.facts("orphan_batch_dirs") == "0" &&
      ra.report.facts("stale_consolidated_dirs") == "0" &&
      ra.report.facts("tmp_files") == "0", ra.render)
    assert(StateInspect.repair(spark, s"$rootA/t").removed.isEmpty)
    rm(rootA)

    // bucketed: torn-commit future manifest + its orphan version dir,
    // torn addColumn schema file, vacuumed version's leftover bucket
    // dir — swept; the live read and the TAGGED retained version
    // survive verbatim
    val rootB = Files.createTempDirectory("repair_bucketed").toString
    val tb = new BucketedTable(spark, s"$rootB/t", "k", 4)
    tb.merge(kvDF((0L until 12L).map(k => (k, k))), 0L)
    tb.tag("pin", 0L)
    tb.merge(kvDF(Seq(3L -> 30L)), 1L)
    val preB = tb.read().get.collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    Files.write(java.nio.file.Paths.get(s"$rootB/t/manifest_v9"),
      "0,c_9/__bucket=0".getBytes("UTF-8"))                // torn commit
    kvDF(Seq(7L -> 70L)).write.parquet(s"$rootB/t/c_9/__bucket=0")
    Files.write(java.nio.file.Paths.get(s"$rootB/t/columns_v5"),
      "ghost,string,'x'".getBytes("UTF-8"))                // torn addColumn
    kvDF(Seq(6L -> 60L)).write.parquet(s"$rootB/t/c_7/__bucket=2")
    val rb = StateInspect.repair(spark, s"$rootB/t")
    assert(rb.removed.toSet == Set("manifest_v9", "columns_v5",
      "c_9/__bucket=0", "c_9", "c_7/__bucket=2", "c_7"), rb.render)
    assert(tb.read().get.collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq == preB)
    assert(tb.readAt(0L).get.count() == 12L &&
      tb.tags == Map("pin" -> 0L), "tagged history must survive repair")
    assert(rb.report.facts("unreferenced_bucket_dirs") == "0", rb.render)
    assert(StateInspect.repair(spark, s"$rootB/t").removed.isEmpty)
    rm(rootB)

    // snapshot: orphan future snapshot + torn schema file swept;
    // retained history survives
    val rootS = Files.createTempDirectory("repair_snapshot").toString
    val ts = new SnapshotTable(spark, s"$rootS/t")
    ts.commit(toDF(Seq(1L)), 0L)
    ts.commit(toDF(Seq(2L)), 1L)
    toDF(Seq(9L)).write.parquet(s"$rootS/t/v_9")
    Files.write(java.nio.file.Paths.get(s"$rootS/t/columns_v5"),
      "ghost,string,'x'".getBytes("UTF-8"))
    val rs = StateInspect.repair(spark, s"$rootS/t")
    assert(rs.removed.toSet == Set("v_9", "columns_v5"), rs.render)
    assert(ts.read().get.collect().map(_.getLong(0)).toSeq == Seq(2L) &&
      rs.report.facts("orphan_future_snapshots") == "0", rs.render)
    assert(StateInspect.repair(spark, s"$rootS/t").removed.isEmpty)
    rm(rootS)
  }

  test("repair refuses an unhealthy table by name — restore first, never deletion") {
    val root = Files.createTempDirectory("repair_refuse").toString
    val t = new BucketedTable(spark, s"$root/t", "k", 4)
    t.merge(kvDF(Seq(1L -> 10L, 2L -> 20L)), 0L)
    t.merge(kvDF(Seq(2L -> 22L)), 1L)
    // a missing live manifest would make its bucket dirs look
    // unreferenced — exactly the state repair must not touch
    val manifestBody = Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/t/manifest_v1"))
    rm(s"$root/t/manifest_v1")
    val e = intercept[IllegalStateException] {
      StateInspect.repair(spark, s"$root/t")
    }
    assert(e.getMessage.contains("refusing") &&
      e.getMessage.contains("manifest_v1"))
    assert(dirCount(s"$root/t", "c_") == 2, "nothing may be deleted")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/t/manifest_v1"), manifestBody)
    assert(StateInspect.repair(spark, s"$root/t").removed.isEmpty)
    rm(root)
  }

  private def dirCount(path: String, prefix: String): Int =
    Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
      .count(f => f.isDirectory && f.getName.startsWith(prefix))

  test("a never-committed path reports unknown, not a crash") {
    val root = Files.createTempDirectory("fsck_none").toString
    val r = StateInspect.inspect(spark, s"$root/nope")
    assert(r.layout == "unknown" && !r.healthy)
    rm(root)
  }
}
