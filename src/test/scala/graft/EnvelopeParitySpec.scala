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
