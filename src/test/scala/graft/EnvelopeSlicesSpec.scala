package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.EnvelopeSlices

/** Byte-level envelope splitter: structural coverage the integration
  * suites (TypeFidelitySpec, CdcRoundTripSpec, gate cdc_* queries) don't
  * isolate — escapes, whitespace, field order, malformed shapes. */
class EnvelopeSlicesSpec extends AnyFunSuite {

  private def parse(json: String, wantSchema: Boolean = false,
      wantBefore: Boolean = true): Option[(String, String, String, String, String)] =
    Option(EnvelopeSlices.parse(json.getBytes("UTF-8"), wantSchema, wantBefore))
      .map { r =>
        def s(i: Int) = if (r.isNullAt(i)) null else r.getUTF8String(i).toString
        (s(0), s(1), s(2), s(3), s(4))
      }

  test("slices a canonical envelope") {
    val r = parse(
      """{"schema":{"fields":[1,2]},"payload":{"before":null,"after":{"a":1,"b":"x"},"source":{"connector":"mysql","ts_ms":0},"op":"c","ts_ms":5}}""")
    assert(r === Some((null, null, """{"a":1,"b":"x"}""", "c", "mysql")))
  }

  test("captures before and the schema header when asked") {
    val env =
      """{"schema":{"fields":[{"field":"after"}]},"payload":{"before":{"a":0},"after":{"a":1},"source":{"connector":"postgresql"},"op":"u"}}"""
    assert(parse(env, wantSchema = true) ===
      Some(("""{"fields":[{"field":"after"}]}""", """{"a":0}""", """{"a":1}""", "u", "postgresql")))
    // fast path skips before at byte speed
    assert(parse(env, wantBefore = false) ===
      Some((null, null, """{"a":1}""", "u", "postgresql")))
  }

  test("tolerates whitespace, reordered fields, and unknown keys") {
    val r = parse(
      """ { "payload" : { "op" : "d" , "extra": [ {"x": "}"} , 2 ] ,
        |    "source": { "version": "2.1", "connector" : "oracle" } ,
        |    "after" : null , "before": {"a": 3} } ,
        |  "schema": {"deep": {"nest": ["brace }", "]"]}} } """.stripMargin)
    assert(r === Some((null, """{"a": 3}""", null, "d", "oracle")))
  }

  test("decodes escaped scalars; braces inside strings never confuse the walk") {
    val r = parse(
      """{"payload":{"op":"c","after":{"t":"a \"quoted\" } brace"},"source":{"connector":"my\\sql"}}}""")
    assert(r.get._4 === "c")
    assert(r.get._5 === "my\\sql")
    assert(r.get._3 === """{"t":"a \"quoted\" } brace"}""")
  }

  test("malformed input classifies as null row, never throws") {
    for (bad <- Seq("", "{", """{"payload":}""", """{"payload":{"op":"c"""",
        "not json at all", """{"payload": 5}""", """[1,2,3]"""))
      assert(parse(bad) === None, s"input: $bad")
    // a non-object source isn't structural corruption: connector is just
    // absent (same as from_json's null for a shape mismatch)
    assert(parse("""{"payload":{"source":[1],"op":"c"}}""") ===
      Some((null, null, null, "c", null)))
  }

  test("absent payload fields stay null; empty objects parse") {
    assert(parse("""{"payload":{}}""") === Some((null, null, null, null, null)))
    assert(parse("""{"other": 1, "payload":{"op":"r"}}""") ===
      Some((null, null, null, "r", null)))
  }

  test("invalid or truncated unicode escapes classify, never throw") {
    val bsU = "\\" + "u" // Scala 2 pre-processes \u even in triple quotes
    // bad hex digits → scalar decodes to null, row survives
    assert(parse(s"""{"payload":{"op":"${bsU}ZZZZ","after":{"a":1}}}""") ===
      Some((null, null, """{"a":1}""", null, null)))
    // escape truncated by the closing quote must not read past it
    assert(parse(s"""{"payload":{"op":"x${bsU}AB1","after":null}}""") ===
      Some((null, null, null, null, null)))
    // valid escape still decodes
    assert(parse(s"""{"payload":{"op":"${bsU}0063"}}""").get._4 === "c")
  }

  test("multibyte UTF-8 content passes through slices untouched") {
    val r = parse("""{"payload":{"op":"c","after":{"t":"héllo 世界 🙂"}}}""")
    assert(r.get._3 === """{"t":"héllo 世界 🙂"}""")
  }

  test("parseMongo: unescapes document strings, falls back on non-string images") {
    def pm(s: String) = Option(EnvelopeSlices.parseMongo(s.getBytes("UTF-8")))
      .map { r =>
        def g(i: Int) = if (r.isNullAt(i)) null else r.getUTF8String(i).toString
        (g(0), g(1), g(2))
      }
    // after/patch carry escaped extended JSON — must come back unescaped
    assert(pm("""{"schema":{"big":"header"},"payload":{"after":"{\"_id\": {\"$numberLong\": \"7\"}, \"t\": \"a \\\"q\\\"\"}","op":"c"}}""") ===
      Some(("c", """{"_id": {"$numberLong": "7"}, "t": "a \"q\""}""", null)))
    assert(pm("""{"payload":{"op":"u","patch":"{\"$set\": {\"x\": 1}}"}}""") ===
      Some(("u", null, """{"$set": {"x": 1}}""")))
    // JSON-null images read as absent (delete shape)
    assert(pm("""{"payload":{"op":"d","after":null}}""") === Some(("d", null, null)))
    // non-string after (relational-style object) → null: Jackson fallback decides
    assert(pm("""{"payload":{"op":"c","after":{"a":1}}}""") === None)
    // structurally malformed / missing op → null
    assert(pm("""{"payload":{"after":"{}"}}""") === None)
    assert(pm("not json") === None)
    // non-string op → fallback decides (legacy threw ClassCastException)
    assert(pm("""{"payload":{"op":42,"after":"{}"}}""") === None)
    // duplicate top-level payload: last map wins, like Jackson — fields
    // must never merge across the two objects (after from #1 + op from #2
    // would fabricate an insert legacy rejected with "missing after")
    assert(pm("""{"payload":{"after":"{\"a\":1}"},"payload":{"op":"c"}}""") ===
      Some(("c", null, null)))
    assert(pm("""{"payload":{"op":"d"},"payload":{"op":"c","after":"{}"}}""") ===
      Some(("c", "{}", null)))
  }

  test("duplicate or non-object source keys reset connector (Jackson last-wins)") {
    // later empty source object replaces the whole source → connector null
    assert(parse(
      """{"payload":{"op":"c","after":{"a":1},"source":{"connector":"mysql"},"source":{}}}""")
      .get._5 === null)
    // later non-object source likewise clears it
    assert(parse(
      """{"payload":{"op":"c","after":{"a":1},"source":{"connector":"mysql"},"source":null}}""")
      .get._5 === null)
    // and a later source with a connector wins
    assert(parse(
      """{"payload":{"op":"c","source":{"connector":"mysql"},"source":{"connector":"oracle"}}}""")
      .get._5 === "oracle")
  }

  test("escaped key names match where Jackson would (payloa\\u0064 = payload)") {
    // "payload" is a legal JSON encoding of the key "payload"
    val r = parse(
      "{\"payloa\\u0064\":{\"op\":\"c\",\"after\":{\"a\":7},\"source\":{\"connector\":\"mysql\"}}}")
    assert(r === Some((null, null, """{"a":7}""", "c", "mysql")))
    // escaped inner keys too: "op" = "op"
    val r2 = parse("{\"payload\":{\"o\\u0070\":\"u\",\"after\":{\"a\":1}}}")
    assert(r2.get._4 === "u")
  }

  test("duplicate-key shapes match Jackson's last-wins view exactly") {
    // the seeded fuzz builds envelopes from LinkedHashMaps and can never
    // emit duplicate keys — anchor these shapes to Jackson directly
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def jacksonView(json: String): (String, String) = {
      val m = mapper.readValue(json, classOf[java.util.Map[String, Object]])
      val p = m.get("payload").asInstanceOf[java.util.Map[String, Object]]
      val op = if (p == null) null else p.get("op").asInstanceOf[String]
      val conn = if (p == null) null else p.get("source") match {
        case s: java.util.Map[_, _] => s.asInstanceOf[java.util.Map[String, Object]]
          .get("connector").asInstanceOf[String]
        case _ => null
      }
      (op, conn)
    }
    val shapes = Seq(
      """{"payload":{"op":"c","source":{"connector":"one"},"source":{"connector":"two"}}}""",
      """{"payload":{"op":"c","source":{"connector":"one"},"source":{}}}""",
      """{"payload":{"op":"c","source":{"connector":"one"},"source":null}}""",
      """{"payload":{"op":"c","source":{"connector":"one"},"source":7}}""",
      """{"payload":{"op":"u","source":{"connector":"a"}},"payload":{"op":"d"}}""",
      """{"payload":{"op":"u"},"payload":{"op":"d","source":{"connector":"b"}}}""",
      """{"payload":{"op":"c","op":"r","source":{"connector":"x","connector":"y"}}}""")
    shapes.foreach { json =>
      val (op, conn) = jacksonView(json)
      val got = parse(json).get
      assert(got._4 === op, s"op mismatch on $json")
      assert(got._5 === conn, s"connector mismatch on $json")
    }
  }

  test("duplicate top-level payload keys: last wins on the relational path too") {
    assert(parse("""{"payload":{"op":"d","before":{"x":1}},"payload":{"op":"c","after":{"a":1}}}""") ===
      Some((null, null, """{"a":1}""", "c", null)))
  }
}

/** Plan-shape guard for the sliced decode: the slicer and each from_json
  * must be evaluated once per row (CollapseProject duplicating either
  * would undo the whole optimization) and the decode must stay inside
  * whole-stage codegen. */
class EnvelopeSlicesPlanSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import org.apache.spark.sql.functions._

  test("decode plan: one slicer, one from_json per image, codegen intact") {
    val raw = spark.range(10).select(
      concat(lit("""{"payload":{"conv_id":"c"""), col("id"),
        lit("""","turn_idx":0}}""")).cast("binary").as("key"),
      concat(lit("""{"schema":{},"payload":{"before":null,"after":{"conv_id":"c"""),
        col("id"),
        lit("""","turn_idx":0,"role":"user","text":"t","tool":null,"ts":1700000000000000},"source":{"connector":"mysql","ts_ms":0},"op":"c","ts_ms":0}}"""))
        .cast("binary").as("value"),
      lit("t").as("topic"), lit(0).as("partition"), col("id").as("offset"))
    val decoded = graft.decode.EnvelopeDecoder.decodeRelational(
      raw, graft.model.CdcSchema.transcripts,
      graft.decode.DecodeOptions(strict = true, validate = true))
    val plan = decoded.queryExecution.executedPlan
    val s = plan.toString
    assert("envelopeslices\\(".r.findAllIn(s.toLowerCase).size === 1, s)
    // key + after + before images (transcripts needs no schema header)
    assert("from_json\\(".r.findAllIn(s).size === 3, s)
    assert(plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.nonEmpty, s)
    assert(decoded.count() === 10)
  }
}
