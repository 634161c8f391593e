package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.apply.CdcApply
import graft.decode.{DecodeOptions, MongoDecoder}
import graft.gen.MongoGen

/** Mongo-connector round trip: extended-JSON envelopes with $set/$unset
  * patches, full replaces and deletes → decode → strict patch-fold apply →
  * oracle parity (mirror of MongoDBDebeziumTransformSuite). */
class MongoDecodeSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private def applied(wl: MongoGen.Workload) = {
    val events = MongoDecoder.decode(
      MongoGen.toDataFrame(spark, wl), MongoGen.schema, DecodeOptions(strict = true))
    CdcApply.applyStrict(events, MongoGen.schema)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        Option(r.getDecimal(3)).map(_.toPlainString), r.getTimestamp(4).getTime))
      .toSet
  }

  private def oracle(wl: MongoGen.Workload) =
    wl.finalState.values.map(d =>
      (d.id, d.role, d.text, d.score.map(_.toPlainString), d.tsMillis)).toSet

  test("mongo patch workload reaches oracle parity") {
    val wl = MongoGen.workload(seed = 31, nDocs = 30, nTxns = 300)
    assert(applied(wl) == oracle(wl))
  }

  test("mongo $unset clears only masked fields; others survive placeholders") {
    import MongoGen._
    val d = Doc("doc-x", "user", "original", Some(new java.math.BigDecimal("12.34")), 1700000000000L)
    val wl = Workload(
      IndexedSeq(Insert(d), Patch("doc-x", Map.empty, Seq("score"))),
      Map("doc-x" -> d.copy(score = None)))
    assert(applied(wl) == oracle(wl))
  }

  test("mongo full replace rewrites the whole document") {
    import MongoGen._
    val d = Doc("doc-y", "user", "v1", Some(new java.math.BigDecimal("1.00")), 1700000000000L)
    val d2 = Doc("doc-y", "assistant", "v2", None, 1700000001000L)
    val wl = Workload(IndexedSeq(Insert(d), Replace(d2)), Map("doc-y" -> d2))
    assert(applied(wl) == oracle(wl))
  }

  test("mongo decode requires strict mode") {
    val wl = MongoGen.workload(seed = 32, nDocs = 3, nTxns = 5)
    val ex = intercept[IllegalArgumentException] {
      MongoDecoder.decode(MongoGen.toDataFrame(spark, wl), MongoGen.schema,
        DecodeOptions(strict = false))
    }
    assert(ex.getMessage.contains("strict"))
  }
}
