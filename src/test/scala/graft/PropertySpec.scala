package graft

import graft.functions.{TextExpressions, TopKBuffer}
import graft.sources.SequenceSupport
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the hand-rolled kernels (no Spark session —
  * these exercise the pure logic the expressions delegate to). */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("TopKBuffer equals sort-take reference for any input and k") {
    val entries = Gen.listOf(Gen.zip(Gen.chooseNum(-1e9, 1e9), Gen.chooseNum(0L, 1000L)))
    check(Prop.forAll(entries, Gen.chooseNum(1, 20)) { (xs, k) =>
      val buf = new TopKBuffer(k)
      xs.foreach { case (s, i) => buf.add(s, i) }
      val expectedWithDups = xs.sortBy { case (s, i) => (-s, i) }.take(k)
      buf.sortedDesc.toSeq == expectedWithDups
    })
  }

  test("TopKBuffer merge equals single-buffer accumulation") {
    val entries = Gen.listOf(Gen.zip(Gen.chooseNum(-1e6, 1e6), Gen.chooseNum(0L, 100L)))
    check(Prop.forAll(entries, entries, Gen.chooseNum(1, 10)) { (a, b, k) =>
      val m1 = new TopKBuffer(k); val m2 = new TopKBuffer(k); val all = new TopKBuffer(k)
      a.foreach { case (s, i) => m1.add(s, i); all.add(s, i) }
      b.foreach { case (s, i) => m2.add(s, i); all.add(s, i) }
      m1.mergeIn(m2)
      m1.sortedDesc.toSeq == all.sortedDesc.toSeq
    })
  }

  test("TopKBuffer serialization roundtrip") {
    val entries = Gen.listOf(Gen.zip(Gen.chooseNum(-1e6, 1e6), Gen.chooseNum(0L, 100L)))
    check(Prop.forAll(entries, Gen.chooseNum(1, 10)) { (xs, k) =>
      val buf = new TopKBuffer(k)
      xs.foreach { case (s, i) => buf.add(s, i) }
      TopKBuffer.deserialize(k, buf.serialize()).sortedDesc.toSeq == buf.sortedDesc.toSeq
    })
  }

  test("ShingleHashes count: max(1, tokens - k + 1) for space-joined words") {
    val word = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    check(Prop.forAll(Gen.listOf(word), Gen.chooseNum(1, 5)) { (words, k) =>
      val text = words.mkString(" ")
      val hashes = TextExpressions.ShingleHashes.compute(text, k)
      val n = words.count(_.nonEmpty)
      if (n == 0) hashes.length == 1
      else if (n < k) hashes.length == 1
      else hashes.length == n - k + 1
    })
  }

  test("ShingleHashes: equal texts hash equal; appending a word shifts, not rewrites") {
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.identifier), Gen.identifier) { (words, extra) =>
      val k = 2
      val base = TextExpressions.ShingleHashes.compute(words.mkString(" "), k)
      val ext = TextExpressions.ShingleHashes.compute((words :+ extra).mkString(" "), k)
      // existing shingle hashes are stable under append (prefix property)
      words.length < k || base.toSeq == ext.toSeq.take(base.length)
    })
  }

  test("StringShinglesImpl: shingle i is exactly words.slice(i, i+k) joined") {
    import org.apache.spark.unsafe.types.UTF8String
    val word = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    check(Prop.forAll(Gen.listOf(word), Gen.chooseNum(1, 5)) { (words, k) =>
      val text = words.mkString(" ")
      val out = graft.functions.StringShinglesImpl.compute(UTF8String.fromString(text), k)
        .toArray[AnyRef](org.apache.spark.sql.types.StringType).map(_.toString)
      val toks = if (text.isEmpty) Array("") else text.split(' ')
      if (toks.length < k) out.toSeq == Seq(text)
      else out.toSeq == toks.sliding(k).map(_.mkString(" ")).toSeq
    })
  }

  test("MinHashImpl: signature stable under text repetition; bands = grouped signature") {
    // needs >= k tokens: below that the degenerate whole-text shingle
    // hash changes entirely under repetition (by design)
    check(Prop.forAll(Gen.chooseNum(3, 12).flatMap(n => Gen.listOfN(n, Gen.identifier))) { words =>
      val s = words.mkString(" ")
      val sig1 = graft.functions.MinHashImpl.signature(s, 3, 16)
      // repeating the text adds no NEW shingles except at the seam —
      // check the weaker, always-true property: per-slot minima only
      // decrease (more shingles can only lower a min)
      val sig2 = graft.functions.MinHashImpl.signature(s + " " + s, 3, 16)
      val monotone = sig1.zip(sig2).forall { case (a, b) => b <= a }
      val bands = graft.functions.MinHashImpl.bands(s, 3, 16, 4)
      monotone && bands.length == 4
    })
  }

  test("SimHashImpl: single-token signature IS the token hash; repetition-invariant") {
    check(Prop.forAll(Gen.identifier, Gen.chooseNum(2, 5)) { (tok, reps) =>
      val single = graft.functions.SimHashImpl.signature(tok, useMd5 = false)
      val hashEq = single == graft.functions.SimHashImpl.tokenHash(tok, useMd5 = false)
      // k copies of the same text scale every bit count by k — signs
      // (hence the signature) cannot change
      val text = List.fill(reps)(tok).mkString(" ")
      hashEq && graft.functions.SimHashImpl.signature(text, useMd5 = false) == single
    })
  }

  test("NearestCentroids.select: k distinct in-range ids, zero vector safe") {
    val centroids = Array.tabulate(4 * 8)(i => math.sin(i * 1.3)) // 4 centroids, dim 8
    check(Prop.forAll(Gen.listOfN(8, Gen.chooseNum(-1.0, 1.0)), Gen.chooseNum(1, 6)) { (v, np) =>
      val out = graft.functions.VectorExpressions.NearestCentroids
        .select(v.toArray, centroids, 8, 4, np)
      out.length == math.min(np, 4) && out.distinct.length == out.length &&
        out.forall(i => i >= 0 && i < 4)
    })
    // all-NaN similarity path (zero vector) must not crash and must
    // still return distinct ids
    val z = graft.functions.VectorExpressions.NearestCentroids
      .select(Array.fill(8)(0.0), centroids, 8, 4, 3)
    assert(z.toSeq == Seq(0, 1, 2))
  }

  test("sequence CSV codec roundtrips arbitrary strings (null -> empty)") {
    val field = Gen.oneOf(Gen.const(null: String),
      Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(',', '"', '\n', ' '))).map(_.mkString))
    check(Prop.forAll(Gen.nonEmptyListOf(field)) { fields =>
      val decoded = SequenceSupport.decode(SequenceSupport.encode(fields))
      decoded.toSeq == fields.map(f => if (f == null) "" else f)
    })
  }
}
