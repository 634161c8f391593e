package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.LakeTable

/** Change-data-feed between snapshots: LakeTable.changes(from, to)
  * emits exactly the keys whose final state differs, stamped
  * insert/update/delete, scanning only buckets the intervening commits
  * touched (asserted via DataFrame.inputFiles). */
class LakeCdfSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("v", LongType, nullable = true)))

  private def rows(lo: Long, hi: Long, tag: String = "a"): DataFrame =
    spark.range(lo, hi).select(col("id"),
      concat(lit(s"$tag-"), col("id").cast("string")).as("name"),
      (col("id") * 10).as("v"))

  private def newTable(nBuckets: Int = 8): LakeTable = {
    val t = new LakeTable(spark, Scratch.dir("lake-cdf"))
    t.create(schema, Seq("id"), nBuckets = nBuckets)
    t
  }

  /** deltas frame for merge(): payload + operation + offset (lineage) */
  private def deltas(df: DataFrame, op: String): DataFrame =
    df.withColumn("operation", lit(op)).withColumn("offset", col("id"))

  private def byType(df: DataFrame): Map[String, Seq[Row]] =
    df.collect().toSeq.groupBy(_.getAs[String]("_change_type"))

  test("insert / update / delete detected; unchanged keys silent") {
    val t = newTable()
    t.append(rows(0, 100), "c0", 0L)
    val v1 = t.currentVersion.get
    // commit 1: update ids 0-9 (new name), delete 90-99, insert 100-109
    t.merge(deltas(rows(0, 10, "b"), "u")
      .unionByName(deltas(rows(90, 100), "d"))
      .unionByName(deltas(rows(100, 110), "c")), "c1", 1L)
    val v2 = t.currentVersion.get
    val ch = t.changes(v1, Some(v2))
    val m = byType(ch)
    assert(m("insert").map(_.getLong(0)).sorted == (100L until 110L))
    assert(m("update").map(_.getLong(0)).sorted == (0L until 10L))
    assert(m("update").forall(_.getAs[String]("name").startsWith("b-")))
    assert(m("delete").map(_.getLong(0)).sorted == (90L until 100L))
    // delete rows carry the FROM image
    assert(m("delete").forall(_.getAs[String]("name").startsWith("a-")))
    assert(ch.count() == 30) // 70 unchanged keys emit nothing
  }

  test("scan is bounded to touched buckets (manifest file-diff pruning)") {
    val t = newTable(nBuckets = 8)
    t.append(rows(0, 800), "c0", 0L)
    val v1 = t.currentVersion.get
    // a single-key update touches exactly one bucket
    t.merge(deltas(rows(5, 6, "b"), "u"), "c1", 1L)
    val v2 = t.currentVersion.get
    val ch = t.changes(v1, Some(v2))
    assert(byType(ch)("update").map(_.getLong(0)) == Seq(5L))
    val allFiles = t.snapshot(v2).files.size + t.snapshot(v1).files.size
    val scanned = ch.inputFiles.length
    assert(scanned < allFiles,
      s"expected bucket-pruned scan, read $scanned of $allFiles files")
    // both versions of ONE bucket: at most (files of that bucket in v1)
    // + (files of it in v2)
    val touchedBucket = t.snapshot(v2).files
      .filterNot(f => t.snapshot(v1).files.map(_.path).toSet(f.path))
      .map(_.bucket).toSet
    assert(touchedBucket.size == 1)
  }

  test("merge-on-read deltas and compaction-only rewrites") {
    val t = newTable()
    t.append(rows(0, 100), "c0", 0L)
    val v1 = t.currentVersion.get
    t.mergeDeltas(deltas(rows(0, 5, "m"), "u"), "c1", 1L)
    val v2 = t.currentVersion.get
    val m = byType(t.changes(v1, Some(v2)))
    assert(m("update").map(_.getLong(0)).sorted == (0L until 5L))
    assert(m.keySet == Set("update"))
    // compaction rewrites files but changes no rows → empty feed
    t.compact()
    val v3 = t.currentVersion.get
    assert(t.changes(v2, Some(v3)).count() == 0)
  }

  test("delta-key fast path: eligibility, layout-only short-circuit, parity") {
    val t = newTable()
    t.append(rows(0, 200), "c0", 0L)
    val v1 = t.currentVersion.get
    t.mergeDeltas(deltas(rows(0, 3, "x"), "u")
      .unionByName(deltas(rows(200, 205), "c"))
      .unionByName(deltas(rows(190, 195), "d")), "c1", 1L)
    t.mergeDeltas(deltas(rows(3, 6, "y"), "u"), "c2", 2L)
    val v2 = t.currentVersion.get
    // pure-mergeDeltas interval is eligible: candidate files are exactly
    // the two commits' delta files
    val cand = t.intervalChangeFiles(t.snapshot(v1), t.snapshot(v2))
    assert(cand.isDefined && cand.get.nonEmpty)
    assert(cand.get.forall(_.delta))
    val m = byType(t.changes(v1, Some(v2)))
    assert(m("update").map(_.getLong(0)).sorted == (0L until 6L))
    assert(m("insert").map(_.getLong(0)).sorted == (200L until 205L))
    assert(m("delete").map(_.getLong(0)).sorted == (190L until 195L))
    assert(m("delete").forall(_.getAs[String]("name").startsWith("a-")))

    // mergeDeltas + auto-compaction in the interval: the compact commit
    // is key-preserving; the delta files stay reachable via the
    // intermediate snapshot's manifest, so the path stays eligible
    t.mergeDeltas(deltas(rows(6, 8, "z"), "u"), "c3", 3L, autoCompact = 1)
    val v3 = t.currentVersion.get
    assert(t.snapshot(v3).lineage.exists(_.get("operation").asText() == "compact"))
    assert(t.intervalChangeFiles(t.snapshot(v2), t.snapshot(v3)).exists(_.nonEmpty))
    assert(byType(t.changes(v2, Some(v3)))("update").map(_.getLong(0)).sorted
      == Seq(6L, 7L))

    // layout-only interval: empty feed, zero files read
    t.compact()
    val v4 = t.currentVersion.get
    val quiet = t.changes(v3, Some(v4))
    assert(quiet.count() == 0)
    assert(quiet.inputFiles.isEmpty, "layout-only interval must not scan data")
    assert(quiet.columns.toSeq == Seq("id", "name", "v", "_change_type"))

    // a COW merge in the interval rewrites whole buckets -> ineligible
    // (falls back to the touched-bucket diff, same answer)
    t.merge(deltas(rows(10, 12, "w"), "u"), "c4", 4L)
    val v5 = t.currentVersion.get
    assert(t.intervalChangeFiles(t.snapshot(v4), t.snapshot(v5)).isEmpty)
    assert(byType(t.changes(v4, Some(v5)))("update").map(_.getLong(0)).sorted
      == Seq(10L, 11L))

    // append in the interval: its base files carry the new keys -> eligible
    t.append(rows(300, 310), "c5", 5L)
    val v6 = t.currentVersion.get
    assert(t.intervalChangeFiles(t.snapshot(v5), t.snapshot(v6)).exists(_.nonEmpty))
    assert(byType(t.changes(v5, Some(v6)))("insert").map(_.getLong(0)).sorted
      == (300L until 310L))
  }

  test("fast path restricts the fold to interval keys (patch deltas included)") {
    val t = newTable()
    t.append(rows(0, 100), "c0", 0L)
    t.mergeDeltas(deltas(rows(0, 50, "m"), "u"), "c1", 1L)
    val v2 = t.currentVersion.get
    // patch delta (partial update) on 2 keys: fast path must fold
    // patches on top of prior state for exactly those keys
    val patch = rows(5, 7, "p").select(col("id"),
        col("name"), lit(null).cast("long").as("v"))
      .withColumn("operation", lit("u"))
      .withColumn("offset", col("id"))
      .withColumn("_patch_mask", array(lit("name")))
    t.mergeDeltas(patch, "c2", 2L)
    val v3 = t.currentVersion.get
    assert(t.intervalChangeFiles(t.snapshot(v2), t.snapshot(v3)).exists(_.nonEmpty))
    val m = byType(t.changes(v2, Some(v3)))
    assert(m.keySet == Set("update"))
    assert(m("update").map(_.getLong(0)).sorted == Seq(5L, 6L))
    // patched name, UNTOUCHED v folded from the prior delta's image
    assert(m("update").forall(_.getAs[String]("name").startsWith("p-")))
    assert(m("update").map(r => (r.getLong(0), r.getLong(2))).toMap
      == Map(5L -> 50L, 6L -> 60L))
  }

  test("rebucket falls back to full diff; evolution aligns to to-schema") {
    val t = newTable(nBuckets = 4)
    t.append(rows(0, 50), "c0", 0L)
    val v1 = t.currentVersion.get
    t.rebucket(8)
    t.merge(deltas(rows(0, 1, "r"), "u"), "c1", 1L)
    val v2 = t.currentVersion.get
    val m = byType(t.changes(v1, Some(v2)))
    assert(m("update").map(_.getLong(0)) == Seq(0L))
    assert(m.keySet == Set("update"))
    // evolution: new column; rows re-written with a non-null value in it
    // report as updates, untouched rows (null in both) stay silent
    val t2 = newTable()
    t2.append(rows(0, 20), "c0", 0L)
    val e1 = t2.currentVersion.get
    t2.evolveSchema(StructType(schema.fields :+
      StructField("extra", StringType, nullable = true)))
    t2.merge(
      deltas(rows(0, 3, "a"), "u").withColumn("extra", lit("x")), "c1", 1L)
    val e2 = t2.currentVersion.get
    val em = byType(t2.changes(e1, Some(e2)))
    assert(em("update").map(_.getLong(0)).sorted == (0L until 3L))
    assert(em("update").forall(_.getAs[String]("extra") == "x"))
    assert(em.keySet == Set("update"))
  }

  test("consumer positions: bootstrap, incremental replay, ack monotonicity") {
    val t = newTable()
    t.append(rows(0, 50), "c0", 0L)
    val (boot, v1) = t.changesSince("reader")
    assert(boot.filter(col("_change_type") === "insert").count() == 50)
    assert(boot.count() == 50)
    t.ackChanges("reader", v1)
    assert(t.changesSince("reader")._1.count() == 0)
    t.merge(deltas(rows(0, 5, "b"), "u"), "c1", 1L)
    val (inc, v2) = t.changesSince("reader")
    assert(inc.count() == 5)
    // crash before ack -> identical interval replays
    assert(t.changesSince("reader")._1.count() == 5)
    t.ackChanges("reader", v2)
    assert(t.changesSince("reader")._1.count() == 0)
    assert(t.consumerPosition("reader").contains(v2))
    intercept[IllegalArgumentException](t.ackChanges("reader", v1))
    intercept[IllegalArgumentException](t.ackChanges("reader", v2 + 10))
    intercept[IllegalArgumentException](t.changesSince("../evil"))
  }

  test("lake-to-lake sync: downstream merge keyed on (consumer, version) is exactly-once") {
    val a = newTable()
    val b = newTable()
    a.append(rows(0, 40), "c0", 0L)
    def sync(ack: Boolean = true): Unit = {
      val (feed, to) = a.changesSince("b-sync")
      val ds = feed.withColumn("operation",
          when(col("_change_type") === "delete", lit("d"))
            .when(col("_change_type") === "update", lit("u"))
            .otherwise(lit("c")))
        .withColumn("offset", lit(to.toLong))
        .drop("_change_type")
      b.merge(ds, "b-sync", to.toLong)
      if (ack) a.ackChanges("b-sync", to)
    }
    sync()
    assert(b.read().count() == 40)
    a.merge(deltas(rows(0, 3, "z"), "u").unionByName(deltas(rows(38, 40), "d")), "c1", 1L)
    sync(ack = false) // downstream applied, then "crash" before the ack
    sync() // replay: merge's (checkpointId, batchId) makes the re-apply a no-op
    val st = b.read().collect().map(r => (r.getLong(0), r.getAs[String]("name"))).toMap
    assert(st.size == 38)
    assert(st(0L).startsWith("z-"))
    assert(!st.contains(38L) && !st.contains(39L))
    // a and b agree key-for-key after the chain
    assert(a.read().collect().map(r => (r.getLong(0), r.getAs[String]("name"))).toMap == st)
  }

  test("expireSnapshots pins retention at the slowest consumer position") {
    val t = newTable()
    t.append(rows(0, 20), "c0", 0L)
    val (_, v1) = t.changesSince("slow")
    t.ackChanges("slow", v1)
    t.merge(deltas(rows(0, 1, "b"), "u"), "c1", 1L)
    t.merge(deltas(rows(1, 2, "b"), "u"), "c2", 2L)
    val vHead = t.currentVersion.get
    val expired = t.expireSnapshots(1)
    assert(!expired.contains(v1), "the slow consumer's position must be retained")
    assert(t.consumerPositions() == Map("slow" -> v1))
    // the lagging consumer still resumes incrementally (keys 0 and 1)
    assert(t.changesSince("slow")._1.count() == 2)
    // once caught up, the old versions are expirable
    t.ackChanges("slow", vHead)
    assert(t.expireSnapshots(1).contains(v1))
    // respectConsumers=false expires regardless; the stranded consumer
    // fails with the re-bootstrap remediation instead of losing changes
    t.merge(deltas(rows(2, 3, "b"), "u"), "c3", 3L)
    val stranded = t.expireSnapshots(1, respectConsumers = false)
    assert(stranded.contains(vHead))
    val e = intercept[IllegalArgumentException](t.changesSince("slow"))
    assert(e.getMessage.contains("re-bootstrap"))
  }

  test("defaults to current snapshot; key-column mismatch rejected") {
    val t = newTable()
    t.append(rows(0, 10), "c0", 0L)
    val v1 = t.currentVersion.get
    t.merge(deltas(rows(10, 12), "c"), "c1", 1L)
    assert(byType(t.changes(v1))("insert").map(_.getLong(0)).sorted == Seq(10L, 11L))
    assert(t.changes(v1, Some(v1)).count() == 0)
  }
}
