package graft.gen

import java.sql.Timestamp

import scala.collection.mutable
import scala.util.Random

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic synthetic CDC workload over the transcripts table +
  * in-memory oracle, mirroring the reference tests' randomized
  * transaction generator (MySQLDebeziumTransformSuite.scala:125-201:
  * Gaussian txn length, 4 op mixes — update / delete-or-insert /
  * delete+insert / insert+update) without any external database.
  *
  * Driver-side by design: used at test scale (≤100k events) where the
  * oracle is an exact fold; the distributed bench generator lives in
  * [[BenchGen]].
  */
object EnvelopeGen {

  case class Turn(convId: String, turnIdx: Int, role: String, text: String,
      tool: Option[String], tsMicros: Long)

  sealed trait Op { def key: (String, Int) }
  case class Create(after: Turn) extends Op { def key = (after.convId, after.turnIdx) }
  case class Read(after: Turn) extends Op { def key = (after.convId, after.turnIdx) }
  case class Update(before: Turn, after: Turn) extends Op { def key = (after.convId, after.turnIdx) }
  case class Delete(before: Turn) extends Op { def key = (before.convId, before.turnIdx) }

  val Roles = Vector("user", "assistant", "tool")
  val Words = Vector("plan", "tool", "call", "result", "think", "answer",
    "query", "observe", "act", "state", "step", "check", "done", "retry")

  private def text(rng: Random, rev: Int): String =
    (0 until (3 + rng.nextInt(20))).map(_ => Words(rng.nextInt(Words.size)))
      .mkString(" ") + s" rev$rev"

  private def mkTurn(rng: Random, convId: String, turnIdx: Int, rev: Int,
      tsMicros: Long): Turn = {
    val role = Roles(rng.nextInt(Roles.size))
    Turn(convId, turnIdx, role, text(rng, rev),
      if (role == "tool") Some("tool-" + rng.nextInt(8)) else None, tsMicros)
  }

  /** Zipf-skewed conversation pick (hot conversations — north rule). */
  private def zipfConv(rng: Random, nConvs: Int, skew: Double): Int =
    if (skew <= 0) rng.nextInt(nConvs)
    else math.min(nConvs - 1,
      math.floor(nConvs * math.pow(rng.nextDouble(), skew)).toInt)

  /** Generated workload: ordered ops (index = offset) + final-state oracle. */
  case class Workload(ops: IndexedSeq[Op], finalState: Map[(String, Int), Turn])

  /** Seeded workload: an initial snapshot of `r` ops, then `nTxns`
    * transactions of the reference's 4 op mixes. The oracle fold tracks
    * live state so every Update/Delete has a correct before image
    * (strict-chain valid). */
  def workload(seed: Long, nConvs: Int, maxTurns: Int, nTxns: Int,
      zipfSkew: Double = 0.0, snapshotFraction: Double = 0.5): Workload = {
    val rng = new Random(seed)
    val state = mutable.LinkedHashMap[(String, Int), Turn]()
    val revs = mutable.HashMap[(String, Int), Int]().withDefaultValue(0)
    val ops = IndexedSeq.newBuilder[Op]
    var ts = 1700000000000000L // fixed epoch micros base

    def nextTs(): Long = { ts += 1000000L + rng.nextInt(1000000); ts }
    def convName(i: Int) = f"conv-$i%06d"

    // initial snapshot: some conversations pre-exist (op 'r')
    for (ci <- 0 until (nConvs * snapshotFraction).toInt; tiLen = 1 + rng.nextInt(maxTurns);
         ti <- 0 until tiLen) {
      val t = mkTurn(rng, convName(ci), ti, 0, nextTs())
      state((t.convId, t.turnIdx)) = t
      ops += Read(t)
    }

    for (_ <- 0 until nTxns) {
      val ci = zipfConv(rng, nConvs, zipfSkew)
      val ti = rng.nextInt(maxTurns)
      val key = (convName(ci), ti)
      rng.nextInt(4) match {
        case 0 => // update (if exists, else insert)
          state.get(key) match {
            case Some(prev) =>
              val rev = revs(key) + 1; revs(key) = rev
              val next = mkTurn(rng, key._1, key._2, rev, nextTs())
              ops += Update(prev, next); state(key) = next
            case None =>
              val t = mkTurn(rng, key._1, key._2, 0, nextTs())
              ops += Create(t); state(key) = t
          }
        case 1 => // delete-or-insert
          state.get(key) match {
            case Some(prev) => ops += Delete(prev); state.remove(key)
            case None =>
              val t = mkTurn(rng, key._1, key._2, 0, nextTs())
              ops += Create(t); state(key) = t
          }
        case 2 => // delete+insert (same key) when exists, else insert
          state.get(key) match {
            case Some(prev) =>
              ops += Delete(prev)
              val t = mkTurn(rng, key._1, key._2, revs(key) + 1, nextTs())
              revs(key) += 1
              ops += Create(t); state(key) = t
            case None =>
              val t = mkTurn(rng, key._1, key._2, 0, nextTs())
              ops += Create(t); state(key) = t
          }
        case 3 => // insert+update (new turn idx beyond maxTurns to be fresh)
          val freshKey = (convName(ci), maxTurns + rng.nextInt(maxTurns))
          state.get(freshKey) match {
            case Some(prev) =>
              val rev = revs(freshKey) + 1; revs(freshKey) = rev
              val next = mkTurn(rng, freshKey._1, freshKey._2, rev, nextTs())
              ops += Update(prev, next); state(freshKey) = next
            case None =>
              val t = mkTurn(rng, freshKey._1, freshKey._2, 0, nextTs())
              ops += Create(t); state(freshKey) = t
              val rev = revs(freshKey) + 1; revs(freshKey) = rev
              val next = mkTurn(rng, freshKey._1, freshKey._2, rev, nextTs())
              ops += Update(t, next); state(freshKey) = next
          }
      }
    }
    Workload(ops.result(), state.toMap)
  }

  // ---------------------------------------------------------------- JSON

  private val mapper = new ObjectMapper()

  /** Schema section for relational envelopes (shape from
    * /root/reference/src/it/resources/mysql/example/create.json). */
  private def relationalSchemaJson: ObjectNode = {
    val root = mapper.createObjectNode()
    root.put("type", "struct")
    val fields = root.putArray("fields")
    for (side <- Seq("before", "after")) {
      val f = fields.addObject()
      f.put("field", side); f.put("type", "struct"); f.put("optional", true)
      val cols = f.putArray("fields")
      def c(n: String, t: String, opt: Boolean, name: String = null): Unit = {
        val o = cols.addObject(); o.put("field", n); o.put("type", t); o.put("optional", opt)
        if (name != null) o.put("name", name)
      }
      c("conv_id", "string", false)
      c("turn_idx", "int32", false)
      c("role", "string", false)
      c("text", "string", false)
      c("tool", "string", true)
      c("ts", "int64", false, "io.debezium.time.MicroTimestamp")
    }
    root
  }

  private def turnNode(t: Turn): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("conv_id", t.convId); o.put("turn_idx", t.turnIdx)
    o.put("role", t.role); o.put("text", t.text)
    t.tool match { case Some(x) => o.put("tool", x); case None => o.putNull("tool") }
    o.put("ts", t.tsMicros)
    o
  }

  /** Serialize one op as (key-json, value-json) for a relational connector. */
  def relationalEnvelope(op: Op, connector: String, tsMs: Long): (String, String) = {
    val (k, opCode, before, after) = op match {
      case Create(a) => (op.key, "c", None, Some(a))
      case Read(a) => (op.key, "r", None, Some(a))
      case Update(b, a) => (op.key, "u", Some(b), Some(a))
      case Delete(b) => (op.key, "d", Some(b), None)
    }
    val key = mapper.createObjectNode()
    val kp = key.putObject("payload")
    kp.put("conv_id", k._1); kp.put("turn_idx", k._2)

    val value = mapper.createObjectNode()
    value.set[ObjectNode]("schema", relationalSchemaJson)
    val p = value.putObject("payload")
    before match { case Some(b) => p.set[ObjectNode]("before", turnNode(b)); case None => p.putNull("before") }
    after match { case Some(a) => p.set[ObjectNode]("after", turnNode(a)); case None => p.putNull("after") }
    val src = p.putObject("source")
    src.put("connector", connector); src.put("ts_ms", tsMs)
    p.put("op", opCode); p.put("ts_ms", tsMs)
    (mapper.writeValueAsString(key), mapper.writeValueAsString(value))
  }

  /** Raw Kafka-shaped event rows (the DebeziumStringKafkaEvent shape). */
  case class RawEnvelope(key: Array[Byte], value: Array[Byte], topic: String,
      partition: Int, offset: Long, timestamp: Timestamp, timestampType: Int)

  /** Materialize a workload as a raw-envelope DataFrame. `shuffleSeed`
    * permutes physical row order (out-of-order delivery) while offsets
    * keep the logical order. */
  def toDataFrame(spark: SparkSession, wl: Workload, connector: String = "mysql",
      topic: String = "cdc.transcripts", numPartitions: Int = 4,
      shuffleSeed: Option[Long] = None): DataFrame = {
    import spark.implicits._
    val rows = wl.ops.zipWithIndex.map { case (op, i) =>
      val (k, v) = relationalEnvelope(op, connector, 1700000000000L + i)
      RawEnvelope(k.getBytes("UTF-8"), v.getBytes("UTF-8"), topic,
        (i % numPartitions), i.toLong, new Timestamp(1700000000000L + i), 0)
    }
    val ordered = shuffleSeed match {
      case Some(s) => new Random(s).shuffle(rows)
      case None => rows
    }
    spark.createDataset(ordered).repartition(numPartitions).toDF()
  }

  /** Expected final transcripts rows (user columns only, no lineage). */
  def expectedRows(wl: Workload): Seq[(String, Int, String, String, Option[String], Long)] =
    wl.finalState.values.toSeq.map(t =>
      (t.convId, t.turnIdx, t.role, t.text, t.tool, t.tsMicros))
}
