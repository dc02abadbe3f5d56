package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class MultimodalSpec extends AnyFunSuite with SparkSpec {

  test("decodeAll: binary plumbing produces deterministic records") {
    val recs = Multimodal.decodeAll(spark, sfDir).collect()
    assert(recs.length == 500)
    val r = recs.minBy(_.doc_id)
    assert(r.n_bytes > 0)
    assert(r.width >= 16 && r.width < 80)
    assert(r.height >= 16 && r.height < 80)
    assert(r.payload.length <= 16)
    // deterministic: same input -> same output
    val again = Multimodal.decodeAll(spark, sfDir).collect().minBy(_.doc_id)
    assert(again.width == r.width && again.height == r.height)
    assert(java.util.Arrays.equals(again.payload, r.payload))
  }

  test("stub decoder dimension derivation") {
    val rec = Multimodal.StubDecoder.decode(7L, "img", Array.fill[Byte](100)(1))
    assert(rec.n_bytes == 100)
    assert(rec.width == 16 + (100 % 64))
    assert(rec.height == 16 + ((100 / 64) % 64))
  }
}
