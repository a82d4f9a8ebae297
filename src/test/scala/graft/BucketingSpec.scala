package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located join via bucketing: pre-bucketed tables joined on the
  * bucket key need NO shuffle at join time — the layout strategy for
  * repeatedly-joined 100 TB fact tables (SURVEY §4: the reference's
  * btree indexes become partitioning/bucketing layout).
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed tables join without a shuffle exchange") {
    // warehouse.dir is a static conf — use external table locations
    val wh = java.nio.file.Files.createTempDirectory("graft_bucketing").toString
    val o = Tables.load(spark, TestSpark.Sf, "orders")
    val l = Tables.load(spark, TestSpark.Sf, "lineitem")
    o.write.mode("overwrite").option("path", s"$wh/orders_b")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("orders_b")
    l.write.mode("overwrite").option("path", s"$wh/lineitem_b")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("lineitem_b")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(sum("l_quantity").as("q"))
      // disable broadcast so the join itself must pick SMJ over buckets
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = joined.queryExecution.executedPlan.toString
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      // no Exchange may appear BELOW the join (bucket layout feeds it
      // directly); the post-aggregation exchange is expected.
      val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinSection.contains("Exchange hashpartitioning"),
        s"join should read bucketed layout without shuffling:\n$joinSection")
      // and the result matches the unbucketed computation
      val expect = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus").agg(sum("l_quantity").as("q"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got.keySet == expect.keySet)
      got.foreach { case (k, v) => assert(math.abs(v - expect(k)) < 1e-6) }
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("incremental-dedup history probe never shuffles the bucketed index") {
    // L40's headline scale claim, pinned as an executed-plan assertion:
    // with the fingerprint index stored bucketed by fp, the per-ingest
    // probe join reads the bucket layout directly — the Exchange(s) in
    // the plan belong to the BATCH side only, so ingest cost is
    // O(batch) regardless of index size.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val wh = java.nio.file.Files.createTempDirectory("graft_incdedup").toString
    val d = Tables.load(spark, TestSpark.Sf, "documents")
    d.filter(col("doc_id") % 3 =!= 0)
      .select(md5(col("text")).as("fp")).distinct()
      .write.mode("overwrite").option("path", s"$wh/hist_fps_b")
      // bucket count = test shuffle partitions so the probe join can
      // co-partition by shuffling ONLY the batch side
      .bucketBy(4, "fp").saveAsTable("hist_fps_b")
    try {
      // AQE re-plans stages at runtime and hides the static exchanges;
      // broadcast would trivially elide the test (a 100 TB index is
      // never broadcast-able) — pin both off for the assertion
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val probe = graft.dedup.Dedup.incrementalDedup(
        d.filter(col("doc_id") % 3 === 0), spark.table("hist_fps_b"),
        "doc_id", "text")
      val plan = probe.queryExecution.executedPlan
      val leaves = plan.collectLeaves().map(_.toString)
      assert(leaves.exists(_.contains("hist_fps_b")),
        "probe must scan the bucketed index table")
      val shuffledHistory = plan
        .collect { case e: ShuffleExchangeExec => e }
        .filter(_.collectLeaves().exists(_.toString.contains("hist_fps_b")))
      assert(shuffledHistory.isEmpty,
        s"history side of the probe join must come straight off the bucket " +
          s"layout, found: ${shuffledHistory.map(_.nodeName).mkString(",")}")
      // and the probe result matches the unbucketed computation
      val expect = graft.dedup.Dedup.incrementalDedup(
        d.filter(col("doc_id") % 3 === 0),
        d.filter(col("doc_id") % 3 =!= 0)
          .select(md5(col("text")).as("fp")).distinct(),
        "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
      val got = probe.collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
      assert(got == expect)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS hist_fps_b")
    }
  }

  test("snapshot diff over bucketed-by-id snapshots joins with no exchange") {
    // L49's scale claim (SnapshotDiff.scala): under the L40 bucketed
    // layout the full-outer diff join is co-partitioned — NEITHER side
    // shuffles; the map-side md5 projection preserves the bucket
    // distribution on id. Round-9 verdict item 4: claim → executed-plan
    // assertion.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val wh = java.nio.file.Files.createTempDirectory("graft_snapdiff").toString
    val d = Tables.load(spark, TestSpark.Sf, "documents")
    d.filter(col("doc_id") % 7 =!= 0)
      .write.mode("overwrite").option("path", s"$wh/snap_old_b")
      .bucketBy(4, "doc_id").saveAsTable("snap_old_b")
    d.filter(col("doc_id") % 5 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 3 === 0, concat(col("text"), lit(" [rev2]")))
          .otherwise(col("text")))
      .write.mode("overwrite").option("path", s"$wh/snap_new_b")
      .bucketBy(4, "doc_id").saveAsTable("snap_new_b")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val diffed = graft.operators.SnapshotDiff.diff(
        spark.table("snap_old_b"), spark.table("snap_new_b"),
        "doc_id", "text")
      val plan = diffed.queryExecution.executedPlan
      val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
      assert(exchanges.isEmpty,
        s"bucketed snapshot diff must be exchange-free, found: " +
          s"${exchanges.map(_.nodeName).mkString(",")}\n$plan")
      // and it matches the unbucketed computation
      val unbucketed = graft.operators.SnapshotDiff.diff(
        d.filter(col("doc_id") % 7 =!= 0),
        d.filter(col("doc_id") % 5 =!= 0)
          .withColumn("text",
            when(col("doc_id") % 3 === 0, concat(col("text"), lit(" [rev2]")))
              .otherwise(col("text"))),
        "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
      val got = diffed.collect().map(r => r.getLong(0) -> r.getString(3)).toMap
      assert(got == unbucketed)
      assert(got.values.toSet == Set("added", "removed", "changed", "unchanged"))
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS snap_old_b")
      spark.sql("DROP TABLE IF EXISTS snap_new_b")
    }
  }

  test("cross-corpus probe never shuffles the bucketed banded fp index") {
    // L53's scale claim: with the banded fingerprint index stored
    // bucketed by band_key, the candidate join streams the index off
    // its layout — only the batch side shuffles, so per-ingest probe
    // cost is O(batch) regardless of reference-corpus size.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val wh = java.nio.file.Files.createTempDirectory("graft_crossdedup").toString
    val d = Tables.load(spark, TestSpark.Sf, "documents")
    val rFp = graft.dedup.Dedup.withSimhash(
      d.filter(col("doc_id") % 3 =!= 0), "doc_id", "text").localCheckpoint()
    graft.dedup.Dedup.bandedFpIndex(rFp)
      .write.mode("overwrite").option("path", s"$wh/banded_idx_b")
      .bucketBy(4, "band_key").saveAsTable("banded_idx_b")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val bFp = graft.dedup.Dedup.withSimhash(
        d.filter(col("doc_id") % 3 === 0), "doc_id", "text").localCheckpoint()
      val probe = graft.dedup.Dedup.crossNearDedupProbe(
        bFp, spark.table("banded_idx_b"), 3)
      val plan = probe.queryExecution.executedPlan
      // locate the candidate join and assert its INDEX-side child has
      // no exchange between the join and the bucketed scan (downstream
      // aggregation exchanges are expected and irrelevant)
      val joins = plan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
      }.filter(_.collectLeaves().exists(_.toString.contains("banded_idx_b")))
      assert(joins.nonEmpty, s"probe must join the bucketed index:\n$plan")
      // collect is pre-order: the LAST join containing the index leaf
      // is the innermost — the candidate join itself (the outer result
      // join also contains the leaf in its subtree)
      val idxSide = joins.last.children
        .find(_.collectLeaves().exists(_.toString.contains("banded_idx_b"))).get
      val shuffled = idxSide.collect { case e: ShuffleExchangeExec => e }
      assert(shuffled.isEmpty,
        s"index side of the probe join must stream off the bucket layout, " +
          s"found: ${shuffled.map(_.nodeName).mkString(",")}")
      // and the probe matches the unbucketed computation
      val expect = graft.dedup.Dedup.crossNearDedupProbe(
        bFp, graft.dedup.Dedup.bandedFpIndex(rFp), 3)
        .collect().map(r => r.getLong(0) ->
          (Option(r.get(2)), Option(r.get(3)), r.getBoolean(4))).toMap
      val got = probe.collect().map(r => r.getLong(0) ->
        (Option(r.get(2)), Option(r.get(3)), r.getBoolean(4))).toMap
      assert(got == expect)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS banded_idx_b")
    }
  }

  test("snapshot diff presence is flag-based, not fingerprint-null-based") {
    // ADVICE round 9: a doc PRESENT in both snapshots with NULL text
    // must read unchanged (NULL fp on both sides) or changed (one
    // side), never added/removed.
    import spark.implicits._
    val o = Seq((1L, "a"), (2L, null.asInstanceOf[String]),
      (3L, null.asInstanceOf[String]), (4L, "gone")).toDF("doc_id", "text")
    val n = Seq((1L, "a"), (2L, null.asInstanceOf[String]),
      (3L, "now set"), (5L, "fresh")).toDF("doc_id", "text")
    val got = graft.operators.SnapshotDiff.diff(o, n, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(got == Map(
      1L -> "unchanged",
      2L -> "unchanged", // NULL vs NULL text: present both sides, equal
      3L -> "changed",   // NULL → non-NULL text
      4L -> "removed",
      5L -> "added"))
  }
}
