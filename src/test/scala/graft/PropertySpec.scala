package graft

import graft.adapters.{Dispatch, Mock, PageCombine}
import graft.core.Fixtures
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property laws from FIXTURES.md: combine identity/structure, estimator
  * monotonicity, size-format totality, dispatch totality, extraction
  * determinism/idempotence. Generators are sampled with fixed seeds
  * (deterministic; scalatestplus bridge is not available offline). */
class PropertySpec extends AnyFunSuite {

  private def forAll[T](g: Gen[T], n: Int = 200)(f: T => Unit): Unit = {
    val params = Gen.Parameters.default
    var checked = 0
    (0 until n * 3).foreach { i =>
      if (checked < n) g.apply(params, Seed(0xbeefL + i)).foreach { v => f(v); checked += 1 }
    }
    assert(checked >= n / 2, s"generator too sparse: only $checked samples")
  }

  test("combine(single page) is the identity (deepseek_engine.py:346-347)") {
    forAll(Gen.asciiPrintableStr) { s =>
      assert(PageCombine.combinePages(Seq(s)) == s)
    }
  }

  test("combine structure law: n-1 separators and page markers 2..n") {
    val pages = Gen.choose(2, 12).flatMap(n => Gen.listOfN(n, Gen.alphaNumStr))
    forAll(pages) { ps =>
      val out = PageCombine.combinePages(ps)
      assert("\n\n---\n\n".r.findAllIn(out).length == ps.length - 1)
      (2 to ps.length).foreach(p => assert(out.contains(s"<!-- Page $p -->")))
      assert(!out.contains(s"<!-- Page ${ps.length + 1} -->"))
    }
  }

  test("page-count estimator is monotone in size and >= 1") {
    val gen = for {
      mime <- Gen.oneOf("application/pdf", "application/docx", "app/pptx", "image/png", "text/plain")
      a <- Gen.choose(0L, 10000000L)
      b <- Gen.choose(0L, 10000000L)
    } yield (mime, math.min(a, b), math.max(a, b))
    forAll(gen) { case (mime, lo, hi) =>
      val pLo = Mock.estimatePageCount(mime, lo)
      val pHi = Mock.estimatePageCount(mime, hi)
      assert(pLo >= 1L && pHi >= pLo)
    }
  }

  test("size format is total and unit-bounded") {
    forAll(Gen.choose(0L, Long.MaxValue / 2)) { n =>
      val s = Mock.formatSize(n)
      assert(s.matches("""\d+\.\d [KMGT]?B"""), s)
    }
  }

  test("dispatch is total: any kind string yields an adapter or a validation failure, never a throw") {
    forAll(Gen.oneOf(Gen.alphaNumStr, Gen.asciiPrintableStr,
      Gen.oneOf("html", "pdf", "image/png", "docx", "", "application/x-archive"))) { kind =>
      Dispatch.adapterFor(kind) match {
        case Right(a) => assert(a.name.nonEmpty)
        case Left(f) => assert(f.errorType == "validation" && f.message.nonEmpty)
      }
    }
  }

  test("sampling threshold is total and monotone in the rate; 0 and 1 hit the bounds") {
    import graft.ops.Sampling.thresholdFor
    assert(thresholdFor(0.0) == "00000000")
    assert(thresholdFor(1.0) == "g")
    forAll(Gen.zip(Gen.choose(0.0, 1.0), Gen.choose(0.0, 1.0))) { case (a, b) =>
      val (lo, hi) = if (a <= b) (a, b) else (b, a)
      // hex thresholds order like their rates ("g" sorts above all hex)
      assert(thresholdFor(lo) <= thresholdFor(hi))
      assert(thresholdFor(lo).length == 8 || thresholdFor(lo) == "g")
    }
  }

  test("top-n-gram fraction is bounded, total, and 1000 exactly for constant arrays") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    forAll(Gen.zip(Gen.listOf(Gen.oneOf("a", "b", "c", "dd")), Gen.choose(1, 4))) {
      case (toks: List[String], n: Int) =>
        val v = Seq(Tuple1(toks)).toDF("toks")
          .select(graft.functions.ColumnFns.topNgramFracMilli(col("toks"), n))
          .first().getLong(0)
        assert(v >= 0L && v <= 1000L, s"out of range: $v for $toks n=$n")
        if (toks.length < n) assert(v == 0L, "fewer tokens than the gram size")
        else if (toks.distinct.length == 1) assert(v == 1000L, "constant array is pure repetition")
    }
  }

  test("extraction is deterministic and idempotent over arbitrary fixture indices") {
    forAll(Gen.choose(0L, 1000000L)) { idx =>
      val d1 = Dispatch.extractDoc(Fixtures.doc(idx)).copy(processing_time_ms = 0)
      val d2 = Dispatch.extractDoc(Fixtures.doc(idx)).copy(processing_time_ms = 0)
      assert(d1 == d2)
      // re-extracting the OUTPUT spans of a completed doc is stable:
      // text/image spans pass through unchanged
      if (d1.status == "completed" && d1.spans.forall(s => s.kind == "text" || s.kind == "image")) {
        val again = Dispatch.extractDoc(graft.core.Doc(d1.doc_id, d1.spans))
        assert(again.spans.map(s => (s.kind, s.text, s.media_ref)) ==
          d1.spans.map(s => (s.kind, s.text, s.media_ref)))
      }
    }
  }
}
