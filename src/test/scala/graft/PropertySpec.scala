package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.expressions.{BpeTokens, MgSummary, Tokens, WordShingles}

/** ScalaCheck properties for the pure expression kernels — these run
  * without a SparkSession, directly against the static `compute`
  * methods generated code calls, so the space of inputs is much larger
  * than the example-based specs can cover. */
class PropertySpec extends AnyFunSuite {

  private def check(prop: Prop, label: String): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300),
      prop)
    assert(res.passed, s"$label: ${res.status}")
  }

  // words over a small alphabet, joined with 1..3 spaces and optional
  // leading/trailing runs — exercises the empty-token dropping
  private val genText: Gen[String] = for {
    words <- Gen.listOf(Gen.oneOf("a", "bb", "ccc", "d", "e"))
    seps <- Gen.listOfN(words.length + 1, Gen.chooseNum(0, 3))
  } yield {
    val pads = seps.map(" " * _)
    pads.head + words.zip(pads.tail).map { case (w, p) => w + p }.mkString
  }

  private def strings(a: Any): Seq[String] =
    a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toObjectArray(org.apache.spark.sql.types.StringType)
      .map(_.toString)
      .toSeq

  test("PushBridge ack wire format round-trips any space/segment name and any bounds") {
    import graft.log.PushBridge
    import graft.model.SegmentStatus
    val genName: Gen[String] = Gen.frequency(
      4 -> Gen.asciiPrintableStr, // includes tabs' neighbors, quotes, slashes
      2 -> Gen.listOf(Gen.oneOf("\t", "\n", "\r", "/", "%", "+", " ", "ü", "字", "🙂")).map(_.mkString),
      1 -> Gen.const(""))
    val genStatus: Gen[SegmentStatus] = for {
      sp <- genName; seg <- genName
      fs <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
      ft <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
      ls <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
      lt <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
    } yield SegmentStatus(sp, seg, fs, ft, ls, lt)
    check(
      Prop.forAll(genStatus) { st =>
        PushBridge.decode(PushBridge.encode(st)).contains(st)
      },
      "push-ack round trip")
  }

  test("BpeTokens.compute is lossless and bounded for arbitrary words") {
    val genWords: Gen[String] = Gen
      .listOf(Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString))
      .map(_.mkString(" "))
    check(
      Prop.forAll(genWords) { s =>
        val toks = strings(BpeTokens.compute(UTF8String.fromString(s)))
        val words = s.split(" ").filter(_.nonEmpty).toSeq
        // merging never loses or reorders characters …
        toks.mkString == words.mkString &&
        // … and the count is between #words (full merge) and #chars
        toks.size >= words.size &&
        toks.size <= words.map(_.length).sum
      },
      "bpe")
  }

  test("NormalizeText.compute: idempotent, canonical output, no-copy clean path") {
    import graft.functions.expressions.NormalizeText
    // text mixing letters, combining marks, controls, and space runs
    val genDirty: Gen[String] = Gen
      .listOf(Gen.frequency(
        6 -> Gen.alphaLowerChar.map(_.toString),
        1 -> Gen.const("\u0301"), // combining acute
        1 -> Gen.oneOf("\t", "\n", "\u0000", "\u0007", "\u007f"),
        2 -> Gen.const(" ")))
      .map(_.mkString)
    def norm(s: String): String =
      NormalizeText.compute(UTF8String.fromString(s)).toString
    check(
      Prop.forAll(genDirty) { s =>
        val n = norm(s)
        val canonical =
          // no leading/trailing space, no runs, no control chars left
          !n.startsWith(" ") && !n.endsWith(" ") && !n.contains("  ") &&
            n.forall(c => c > ' ' && c != '\u007f' || c == ' ')
        canonical && norm(n) == n // idempotent
      },
      "normalize-idempotent")
    check(
      Prop.forAll(Gen.listOf(Gen.alphaLowerChar).map(_.mkString)) { w =>
        // clean single-word input takes the no-copy fast path: the very
        // same UTF8String instance comes back
        val u = UTF8String.fromString(w)
        NormalizeText.compute(u) eq u
      },
      "normalize-no-copy")
  }

  test("Tokens.compute == split-and-drop-empties for arbitrary spacing") {
    check(
      Prop.forAll(genText) { s =>
        strings(Tokens.compute(UTF8String.fromString(s))) ==
          s.split(" ").filter(_.nonEmpty).toSeq
      },
      "tokens")
  }

  test("WordShingles.compute: all/distinct consistency and counts") {
    val genK = Gen.chooseNum(1, 4)
    check(
      Prop.forAll(genText, genK) { (s, k) =>
        val toks = s.split(" ").filter(_.nonEmpty).toSeq
        val all = strings(WordShingles.compute(UTF8String.fromString(s), k, false))
        val dis = strings(WordShingles.compute(UTF8String.fromString(s), k, true))
        val expected = toks.sliding(k).filter(_.size == k).map(_.mkString(" ")).toSeq
        all == expected && dis == expected.distinct
      },
      "shingles")
  }

  test("MgSummary: bounds and completeness under arbitrary splits and merges") {
    val genStream: Gen[List[String]] =
      Gen.listOf(Gen.frequency(
        8 -> Gen.const("hot"),
        4 -> Gen.const("warm"),
        3 -> Gen.oneOf("x", "y", "z"),
        2 -> Gen.chooseNum(0, 50).map(i => s"cold$i")))
    val genK = Gen.chooseNum(1, 8)
    val genCuts = Gen.listOfN(3, Gen.chooseNum(0.0, 1.0))
    check(
      Prop.forAll(genStream, genK, genCuts) { (stream, k, cuts) =>
        // split the stream at arbitrary points into up to 4 summaries,
        // then merge left-to-right (the distributed execution shape)
        val bounds = (cuts.map(c => (c * stream.size).toInt).sorted :+ stream.size)
        val parts = (0 +: bounds).zip(bounds).map { case (a, b) =>
          stream.slice(a, b)
        }
        val merged = parts
          .map { p =>
            val s = new MgSummary(k)
            p.foreach(s.update)
            s
          }
          .reduce { (a, b) => a.merge(b); a }
        val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val n = stream.size.toLong
        val boundsOk = merged.counts.forall { case (item, lo) =>
          val t = exact.getOrElse(item, 0L)
          lo <= t && t <= lo + merged.decr
        }
        val capOk = merged.counts.size <= k
        val completeOk = exact.forall { case (item, t) =>
          t <= n / (k + 1.0) || merged.counts.contains(item)
        }
        boundsOk && capOk && completeOk
      },
      "misra-gries")
  }
}
