package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.EnvelopeSlices

/** Differential guard for the decode hot path: the byte-level slicer +
  * per-image from_json must agree with a single monolithic from_json of
  * the whole envelope on every field, over both the generator corpus and
  * adversarial payload content (escaped quotes/braces, unicode escapes,
  * newlines, nested arrays/objects inside string values). Any divergence
  * is a slicer bug by definition — Jackson is the reference. */
class EnvelopeParitySpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private val payloadType = StructType(Seq(
    StructField("conv_id", StringType), StructField("turn_idx", StringType),
    StructField("role", StringType), StructField("text", StringType)))
  private val monolithicType = StructType(Seq(
    StructField("payload", StructType(Seq(
      StructField("before", payloadType),
      StructField("after", payloadType),
      StructField("source", StructType(Seq(StructField("connector", StringType)))),
      StructField("op", StringType))))))

  private def compare(envelopes: Seq[String]): Unit = {
    val df = envelopes.toDF("value")
    val mono = df.select(
      from_json(col("value"), monolithicType).as("_v"))
      .select(col("_v.payload.op").as("op"),
        col("_v.payload.source.connector").as("connector"),
        col("_v.payload.before").as("before"),
        col("_v.payload.after").as("after"))
    val sliced = df.select(EnvelopeSlices.envelopeSlices(
        col("value").cast("binary"), wantSchema = false, wantBefore = true).as("_s"))
      .select(col("_s.op").as("op"), col("_s.connector").as("connector"),
        from_json(col("_s.before_json"), payloadType).as("before"),
        from_json(col("_s.after_json"), payloadType).as("after"))
    val m = mono.collect().map(_.toString)
    val s = sliced.collect().map(_.toString)
    m.zip(s).zip(envelopes).foreach { case ((a, b), env) =>
      assert(a === b, s"divergence on envelope: $env")
    }
  }

  test("generator corpus decodes identically through both paths") {
    val envs = gen.BenchGen.envelopes(spark, 2000)
      .select(col("value").cast("string")).as[String].collect().toSeq
    compare(envs.take(500))
  }

  test("fuzz: slicer agrees with Jackson on 400 random envelopes (seeded)") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val rnd = new scala.util.Random(42)
    // whole-codepoint tokens: indexing chars would split 🙂's surrogate
    // pair into lone surrogates, which UTF8String (hence BOTH decode
    // paths) normalizes away — not a slicer behavior under test
    val tokenPool = Seq("a", "b", "\"", "\\", "{", "}", "[", "]", ":", ",",
      "\n", "\t", " ", "é", "世", "🙂")
    def randStr(): String =
      (0 until rnd.nextInt(12)).map(_ => tokenPool(rnd.nextInt(tokenPool.length))).mkString
    def randValue(depth: Int): Object = rnd.nextInt(if (depth > 2) 4 else 6) match {
      case 0 => randStr()
      case 1 => java.lang.Long.valueOf(rnd.nextLong() % 100000)
      case 2 => java.lang.Boolean.valueOf(rnd.nextBoolean())
      case 3 => null
      case 4 =>
        val m = new java.util.LinkedHashMap[String, Object]()
        (0 until rnd.nextInt(4)).foreach(_ => m.put(randStr(), randValue(depth + 1)))
        m
      case _ =>
        val l = new java.util.ArrayList[Object]()
        (0 until rnd.nextInt(4)).foreach(_ => l.add(randValue(depth + 1)))
        l
    }
    for (i <- 0 until 400) {
      val env = new java.util.LinkedHashMap[String, Object]()
      val payload = new java.util.LinkedHashMap[String, Object]()
      if (rnd.nextBoolean()) env.put("schema", randValue(0))
      payload.put("before", if (rnd.nextBoolean()) null else randValue(1))
      payload.put("after", randValue(1))
      val source = new java.util.LinkedHashMap[String, Object]()
      source.put("connector", randStr())
      payload.put("source", source)
      payload.put("op", randStr())
      env.put("payload", payload)
      if (rnd.nextBoolean()) env.put(randStr(), randValue(0)) // unknown key
      val json = mapper.writeValueAsString(env)

      val r = EnvelopeSlices.parse(json.getBytes("UTF-8"), wantSchema = false, wantBefore = true)
      assert(r != null, s"#$i failed to parse: $json")
      def slot(idx: Int) = if (r.isNullAt(idx)) null else r.getUTF8String(idx).toString
      // scalar fields must match Jackson's own decode exactly
      assert(slot(3) === payload.get("op"), s"#$i op: $json")
      assert(slot(4) === source.get("connector"), s"#$i connector: $json")
      // image slices must re-parse to Jackson-identical trees
      for ((name, idx) <- Seq("before" -> 1, "after" -> 2)) {
        val expected = payload.get(name)
        val got = slot(idx)
        if (expected == null) assert(got == null, s"#$i $name: $json")
        else assert(mapper.readTree(got).toString ===
          // canonical text compare: node equality is Int/Long-type-sensitive
          mapper.valueToTree[com.fasterxml.jackson.databind.JsonNode](expected).toString,
          s"#$i $name: $json")
      }
    }
  }

  test("fuzz: parseMongo agrees with the Jackson map walk on 300 random envelopes") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val rnd = new scala.util.Random(7)
    val tokenPool = Seq("a", "b", "\"", "\\", "{", "}", "[", "]", ":", ",",
      "\n", "\t", " ", "é", "世", "🙂", "$set", "_id")
    def randStr(): String =
      (0 until rnd.nextInt(10)).map(_ => tokenPool(rnd.nextInt(tokenPool.length))).mkString
    for (i <- 0 until 300) {
      val env = new java.util.LinkedHashMap[String, Object]()
      val payload = new java.util.LinkedHashMap[String, Object]()
      if (rnd.nextBoolean()) env.put("schema", randStr())
      // Mongo images are STRING values (extended-JSON documents)
      if (rnd.nextBoolean()) payload.put("after", randStr())
      if (rnd.nextBoolean()) payload.put("patch", randStr())
      payload.put("op", randStr())
      env.put("payload", payload)
      val bytes = mapper.writeValueAsString(env).getBytes("UTF-8")

      val r = EnvelopeSlices.parseMongo(bytes)
      assert(r != null, s"#$i: ${new String(bytes, "UTF-8")}")
      def slot(idx: Int) = if (r.isNullAt(idx)) null else r.getUTF8String(idx).toString
      assert(slot(0) === payload.get("op"), s"#$i op")
      assert(slot(1) === payload.get("after"), s"#$i after")
      assert(slot(2) === payload.get("patch"), s"#$i patch")
    }
  }

  test("adversarial payload content decodes identically through both paths") {
    val bs = "\\" // literal backslash
    def env(afterBody: String, op: String = "u"): String =
      s"""{"schema":{"fields":[{"x":"}{][,"}]},"payload":{"before":null,"after":$afterBody,"source":{"connector":"mysql"},"op":"$op"}}"""
    compare(Seq(
      env(s"""{"conv_id":"a${bs}"b","turn_idx":"1","role":"u","text":"quote ${bs}" and brace } and bracket ]"}"""),
      env(s"""{"conv_id":"c","turn_idx":"2","role":"u","text":"back${bs}${bs}slash ${bs}n newline ${bs}t tab"}"""),
      env(s"""{"conv_id":"d","turn_idx":"3","role":"u","text":"${bs}u00e9${bs}u4e16${bs}u00df"}"""),
      env("""{"conv_id":"é 世界 🙂","turn_idx":"4","role":"u","text":"raw multibyte"}"""),
      env("""{"conv_id":"e","turn_idx":"5","role":"u","text":"{\"nested\":[1,2,{\"k\":\"}\"}]}"}"""),
      env("null", op = "d"),
      """{"payload":{"after":{"conv_id":"f","turn_idx":"6","role":"u","text":"payload first, no schema"},"op":"c","source":{"connector":"postgresql"}}}""",
      """{ "schema" : { } , "payload" : { "op" : "r" , "after" : { "conv_id" : "g" , "turn_idx" : "7" , "role" : "u" , "text" : "spaced" } , "source" : { "connector" : "oracle" } } }"""))
  }
}
