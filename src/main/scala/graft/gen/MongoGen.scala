package graft.gen

import java.sql.Timestamp

import scala.collection.mutable
import scala.util.Random

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

import graft.model.{CdcColumn, CdcSchema, DebeziumEncoding => E}

/** Deterministic MongoDB-flavor CDC workload + oracle: documents keyed by
  * `_id`, mutated by inserts, `$set`/`$unset` partial patches, full
  * replaces and deletes (envelope shape from the reference fixtures at
  * src/it/resources/mongodb/example/ create.json,update.json,delete.json;
  * patch semantics from MongoDBDebeziumTransformSuite.scala:124-251). */
object MongoGen {

  val schema: CdcSchema = CdcSchema(Seq(
    CdcColumn("_id", StringType, nullable = false, E.Direct, keyPart = true),
    CdcColumn("role", StringType, nullable = false),
    CdcColumn("text", StringType, nullable = false),
    CdcColumn("score", DecimalType(10, 2), nullable = true),
    CdcColumn("ts", TimestampType, nullable = false, E.MongoDate)))

  case class Doc(id: String, role: String, text: String,
      score: Option[java.math.BigDecimal], tsMillis: Long)

  sealed trait MOp { def id: String }
  case class Insert(doc: Doc) extends MOp { def id = doc.id }
  /** set: field→new value; unset: field names. */
  case class Patch(id: String, set: Map[String, Any], unset: Seq[String]) extends MOp
  case class Replace(doc: Doc) extends MOp { def id = doc.id }
  case class DeleteDoc(id: String) extends MOp

  case class Workload(ops: IndexedSeq[MOp], finalState: Map[String, Doc])

  def workload(seed: Long, nDocs: Int, nTxns: Int): Workload = {
    val rng = new Random(seed)
    val state = mutable.LinkedHashMap[String, Doc]()
    val ops = IndexedSeq.newBuilder[MOp]
    var rev = 0
    def freshDoc(id: String): Doc = {
      rev += 1
      Doc(id, if (rng.nextBoolean()) "user" else "assistant",
        s"text rev$rev " + rng.alphanumeric.take(20).mkString,
        if (rng.nextBoolean()) Some(new java.math.BigDecimal(rng.nextInt(10000)).movePointLeft(2)) else None,
        1700000000000L + rev * 1000L)
    }
    for (i <- 0 until nDocs) {
      val d = freshDoc(s"doc-$i"); state(d.id) = d; ops += Insert(d)
    }
    for (_ <- 0 until nTxns) {
      val id = s"doc-${rng.nextInt(nDocs)}"
      state.get(id) match {
        case None =>
          val d = freshDoc(id); state(id) = d; ops += Insert(d)
        case Some(cur) =>
          rng.nextInt(4) match {
            case 0 => // $set partial update
              rev += 1
              val newText = s"patched rev$rev"
              val set: Map[String, Any] =
                if (rng.nextBoolean()) Map("text" -> newText)
                else Map("text" -> newText,
                  "score" -> new java.math.BigDecimal(rng.nextInt(10000)).movePointLeft(2))
              ops += Patch(id, set, Nil)
              state(id) = set.foldLeft(cur) {
                case (d, ("text", v: String)) => d.copy(text = v)
                case (d, ("score", v: java.math.BigDecimal)) => d.copy(score = Some(v))
                case (d, _) => d
              }
            case 1 => // $unset nullable field
              ops += Patch(id, Map.empty, Seq("score"))
              state(id) = cur.copy(score = None)
            case 2 => // full replace
              val d = freshDoc(id); ops += Replace(d); state(id) = d
            case 3 =>
              ops += DeleteDoc(id); state.remove(id)
          }
      }
    }
    Workload(ops.result(), state.toMap)
  }

  private val mapper = new ObjectMapper()

  private def docJson(d: Doc): String = {
    val o = mapper.createObjectNode()
    o.put("_id", d.id); o.put("role", d.role); o.put("text", d.text)
    d.score.foreach(s => o.putObject("score").put("$numberDecimal", s.toPlainString))
    o.putObject("ts").put("$date",
      java.time.Instant.ofEpochMilli(d.tsMillis).toString)
    mapper.writeValueAsString(o)
  }

  /** (key-json, value-json) for one mongo op. */
  def envelope(op: MOp): (String, String) = {
    val key = mapper.createObjectNode()
    key.putObject("payload").put("id", op.id)
    val value = mapper.createObjectNode()
    val p = value.putObject("payload")
    val src = p.putObject("source"); src.put("connector", "mongodb")
    op match {
      case Insert(d) =>
        p.put("after", docJson(d)); p.putNull("patch"); p.put("op", "c")
      case Replace(d) =>
        // full-replace patch document (no $set/$unset), carries _id
        p.putNull("after"); p.put("patch", docJson(d)); p.put("op", "u")
      case Patch(id, set, unset) =>
        val patch = mapper.createObjectNode()
        if (set.nonEmpty) {
          val s = patch.putObject("$set")
          set.foreach {
            case (k, v: String) => s.put(k, v)
            case (k, v: java.math.BigDecimal) => s.putObject(k).put("$numberDecimal", v.toPlainString)
            case (k, v) => s.put(k, String.valueOf(v))
          }
        }
        if (unset.nonEmpty) {
          val u = patch.putObject("$unset")
          unset.foreach(k => u.put(k, true))
        }
        p.putNull("after"); p.put("patch", mapper.writeValueAsString(patch)); p.put("op", "u")
      case DeleteDoc(_) =>
        p.putNull("after"); p.putNull("patch"); p.put("op", "d")
    }
    (mapper.writeValueAsString(key), mapper.writeValueAsString(value))
  }

  def toDataFrame(spark: SparkSession, wl: Workload,
      topic: String = "cdc.mongo", numPartitions: Int = 4): DataFrame = {
    import spark.implicits._
    val rows = wl.ops.zipWithIndex.map { case (op, i) =>
      val (k, v) = envelope(op)
      EnvelopeGen.RawEnvelope(k.getBytes("UTF-8"), v.getBytes("UTF-8"), topic,
        i % numPartitions, i.toLong, new Timestamp(1700000000000L + i), 0)
    }
    spark.createDataset(rows).repartition(numPartitions).toDF()
  }
}
