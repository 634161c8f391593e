package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.LakeTable

/** Predicate-scoped DELETE / UPDATE maintenance commits
  * (LakeTable.deleteWhere / updateWhere): the conversation-purge and
  * redaction shapes. The contract under test:
  *  - exactly the matching rows are removed/assigned (NULL predicate
  *    keeps the row — SQL DELETE semantics);
  *  - the rewrite is stats-bounded at FILE granularity for delta-free
  *    buckets (sibling files carry over by path identity) and at bucket
  *    granularity for merge-on-read buckets (fold + compact);
  *  - history stays immutable (time travel shows pre-delete state) and
  *    the change feed reports the mutation as delete/update rows. */
class LakeMutateSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("ts", LongType, nullable = true)))

  private def rows(lo: Long, hi: Long): DataFrame =
    spark.range(lo, hi).select(col("id"),
      concat(lit("n-"), lpad(col("id").cast("string"), 6, "0")).as("name"),
      col("id").as("ts"))

  private def newTable(statsCols: Seq[String] = Seq("ts")): LakeTable = {
    val tmp = java.nio.file.Files.createTempDirectory("lake-mut").toString
    val t = new LakeTable(spark, tmp)
    t.create(schema, Seq("id"), nBuckets = 4, statsColumns = statsCols)
    t
  }

  private def idSet(df: DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  test("deleteWhere removes exactly the matching rows; sibling files carry over") {
    val t = newTable()
    t.append(rows(0, 100), "a", 0L)
    t.append(rows(100, 200), "a", 1L)
    t.append(rows(200, 300), "a", 2L)
    val before = t.currentSnapshot.get.files.map(_.path).toSet
    val total = before.size
    val snap = t.deleteWhere(col("ts") >= 250L)
    assert(idSet(t.read()) == (0L until 250L).toSet)
    // stats bound the rewrite to the last commit's files: every file of
    // the first two commits is carried over by path identity
    val lin = snap.lineage.get
    assert(lin.get("operation").asText() == "deleteWhere")
    assert(lin.get("rewrittenFiles").asInt() <= total / 3)
    assert(lin.get("matchedRows").asLong() == 50L)
    val after = snap.files.map(_.path).toSet
    assert(before.intersect(after).size == total - lin.get("rewrittenFiles").asInt())
    // history is immutable: the pre-delete version still reads in full
    assert(t.read(Some(snap.version - 1)).count() == 300L)
  }

  test("rows with a NULL predicate value are kept (SQL DELETE semantics)") {
    val t = newTable(statsCols = Nil)
    t.append(rows(0, 10)
      .withColumn("ts", when(col("id") < 5, col("ts"))), "a", 0L)
    t.deleteWhere(col("ts") >= 2L)
    // ids 0,1 match=false kept; 2..4 deleted; 5..9 have NULL ts → kept
    assert(idSet(t.read()) == Set(0L, 1L, 5L, 6L, 7L, 8L, 9L))
  }

  test("a provably non-matching predicate is a no-op commit") {
    val t = newTable()
    t.append(rows(0, 100), "a", 0L)
    val v = t.currentVersion
    val snap = t.deleteWhere(col("ts") > 100000L)
    assert(t.currentVersion == v && snap.lineage.isEmpty)
  }

  test("updateWhere assigns matching rows only, casting to the column type") {
    val t = newTable()
    t.append(rows(0, 100), "a", 0L)
    t.updateWhere(col("id") >= 90L && col("id") < 95L,
      Map("name" -> lit("redacted"), "ts" -> lit(-1)))  // Int literal → LongType
    val got = t.read().filter(col("name") === "redacted")
    assert(idSet(got) == (90L until 95L).toSet)
    assert(got.select("ts").collect().forall(_.getLong(0) == -1L))
    // non-matching rows untouched
    assert(t.read().filter(col("name") =!= "redacted").count() == 95L)
    intercept[IllegalArgumentException] {
      t.updateWhere(lit(true), Map("id" -> lit(0L))) // key column
    }
    intercept[IllegalArgumentException] {
      t.updateWhere(lit(true), Map("nope" -> lit(0L))) // unknown column
    }
  }

  test("merge-on-read buckets fold their deltas through the mutation") {
    val t = newTable()
    t.append(rows(0, 100), "a", 0L)
    // delta batch: move ids 10..19 to ts = id + 1000
    val deltas = rows(10, 20)
      .withColumn("ts", col("id") + 1000L)
      .withColumn("operation", lit("u"))
      .withColumn("offset", col("id"))
    t.mergeDeltas(deltas, "cp", 0L)
    assert(t.currentSnapshot.get.files.exists(_.delta))
    val preDelete = t.read().filter(!coalesce(col("ts") >= 1015L, lit(false)))
      .collect().toSet
    val snap = t.deleteWhere(col("ts") >= 1015L) // hits updated ids 15..19
    assert(t.read().collect().toSet == preDelete)
    assert(idSet(t.read()) == (0L until 100L).toSet -- (15L until 20L))
    // the rewritten buckets were compacted: no delta files remain there
    val rewritten = snap.lineage.get.get("candidateBuckets").asInt()
    assert(rewritten <= 4)
    val deltaBucketsBefore = 4 // deltas spread across small bucket count
    assert(snap.files.count(_.delta) <= deltaBucketsBefore)
  }

  test("the change feed reports deleteWhere as deletes and updateWhere as updates") {
    val t = newTable()
    t.append(rows(0, 40), "a", 0L)
    val v1 = t.currentVersion.get
    t.deleteWhere(col("ts") >= 30L)
    val feedDel = t.changes(v1).collect()
    assert(feedDel.forall(_.getString(3) == "delete"))
    assert(feedDel.map(_.getLong(0)).toSet == (30L until 40L).toSet)
    // delete rows carry the from-image
    assert(feedDel.forall(r => r.getString(1).startsWith("n-")))
    val v2 = t.currentVersion.get
    t.updateWhere(col("id") === 5L, Map("name" -> lit("x")))
    val feedUpd = t.changes(v2).collect()
    assert(feedUpd.length == 1 && feedUpd.head.getString(3) == "update" &&
      feedUpd.head.getString(1) == "x")
  }
}
