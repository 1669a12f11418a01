package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native text expressions for the dedup hot path. */
object TextExpressions {

  /** 64-bit hashes of all word `k`-shingles of a (pre-normalized,
    * single-space-separated) text, in one pass with no intermediate
    * shingle strings: each token is FNV-1a-hashed as its bytes stream
    * by, and a ring buffer of the last k token hashes is order-
    * sensitively mixed into one shingle hash. Texts with fewer than k
    * tokens yield one whole-text shingle hash (same degenerate-case
    * semantics as the string-building formulation).
    *
    * Cost: O(bytes + shingles), zero allocations per shingle vs. the
    * `transform(sequence, slice, concat_ws)` formulation which builds
    * every shingle string through interpreted lambdas. */
  case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(a: Any): Any =
      new GenericArrayData(ShingleHashImpl.compute(a.asInstanceOf[UTF8String].toString, k))

    // NOTE: must target the TOP-LEVEL ShingleHashImpl object — a
    // top-level Scala object gets Java static forwarders, so janino
    // sees a plain static call. A nested object's Java name
    // (`TextExpressions$ShingleHashes$`) is not resolvable by janino's
    // source-name lookup and silently killed whole-stage codegen for
    // every stage containing this expression.
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v =>
        s"""
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
           |  graft.functions.ShingleHashImpl.compute($v.toString(), $k));
         """.stripMargin)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Delegator kept for source compatibility (specs reference
    * `TextExpressions.ShingleHashes.compute`); the implementation
    * lives in the top-level [[ShingleHashImpl]] so generated code can
    * reach it as a plain static call. */
  object ShingleHashes {
    def compute(s: String, k: Int): Array[Long] = ShingleHashImpl.compute(s, k)
  }

  /** The COMPLETE `numHashes`-wide MinHash signature of a text in one
    * per-row pass: shingle hashes as in [[ShingleHashes]], then for
    * each shingle the per-seed family h_j = xxh64_int(j, xxh64_long(h,
    * 42)) — bit-identical to the composable
    * `min(xxhash64(shingle_hash, lit(j)))` aggregation pipeline
    * (Spark's XxHash64 folds children left-to-right from seed 42), but
    * with ZERO exchange: the explode→groupBy(id) round the pipeline
    * pays per corpus (shuffling 64 partial minima per doc) disappears
    * — the signature is a map-side scalar. At 100 TB that removes the
    * only corpus-wide shuffle in signature building. */
  case class MinHashSignature(child: Expression, k: Int, numHashes: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(a: Any): Any =
      new GenericArrayData(
        MinHashImpl.signature(a.asInstanceOf[UTF8String].toString, k, numHashes))

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v =>
        s"""
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
           |  graft.functions.MinHashImpl.signature($v.toString(), $k, $numHashes));
         """.stripMargin)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** text → LSH BAND hashes in one pass: the [[MinHashSignature]]
    * fold immediately reduced to `numBands` band hashes
    * (xxh64-chain over each r-row slice, matching the composable
    * `xxhash64(b, slice(sig, b*r+1, r))` bit-for-bit). Exists because
    * banding is a higher-order `transform` lambda in the composable
    * form: with the signature a plain scalar expression,
    * CollapseProject inlines the ENTIRE signature computation into
    * every band's lambda (numBands× recompute — the round-1 "never
    * nest expensive expressions in HOF lambdas" lesson). Fusing the
    * reduction into the expression keeps it computed once, still with
    * zero exchange. */
  case class MinHashBandHashes(child: Expression, k: Int, numHashes: Int,
                               numBands: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(a: Any): Any =
      new GenericArrayData(
        MinHashImpl.bands(a.asInstanceOf[UTF8String].toString, k, numHashes, numBands))

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v =>
        s"""
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
           |  graft.functions.MinHashImpl.bands($v.toString(), $k, $numHashes, $numBands));
         """.stripMargin)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** 64-bit SimHash of a (pre-normalized) text in one per-row pass:
    * tokenize on single spaces, hash each token (xx = Spark's
    * xxhash64-on-string bit-for-bit via XXH64.hashUTF8String; md5 =
    * the portable hi/lo-of-md5 derivation the gate oracle rebuilds),
    * accumulate the 64 ±1 bit counts, pack (bit set when count >= 0).
    * Replaces the explode-tokens→groupBy(id) pipeline and its
    * corpus-wide exchange of 64 partial sums per doc with a map-side
    * scalar — zero shuffle, same bits (pinned by spec). */
  case class SimHashSignature(child: Expression, useMd5: Boolean) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(a: Any): Any =
      SimHashImpl.signature(a.asInstanceOf[UTF8String].toString, useMd5)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = graft.functions.SimHashImpl.signature($v.toString(), $useMd5);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column API: shingle hashes of the normalized text. */
  def shingleHashes(normalizedText: Column, k: Int): Column =
    Bridge.column(ShingleHashes(Bridge.expression(normalizedText), k))

  /** Column API: 64-bit SimHash of the normalized text. */
  def simhashSignature(normalizedText: Column, useMd5: Boolean): Column =
    Bridge.column(SimHashSignature(Bridge.expression(normalizedText), useMd5))

  /** Word k-shingles of a (pre-normalized) text as STRINGS, one pass,
    * each shingle a zero-copy substring slice between token
    * boundaries. Matches the composable
    * `transform(idx, i => concat_ws(" ", slice(tokens, i+1, k)))` form
    * bit-for-bit (incl. the fewer-than-k-tokens degenerate case =
    * whole text), but that form evaluates interpreted lambdas and
    * re-materializes every shingle through concat_ws — ~3× slower in
    * the ngram-verify bench entry. */
  case class StringShingles(child: Expression, k: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(a: Any): Any =
      StringShinglesImpl.compute(a.asInstanceOf[UTF8String], k)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = graft.functions.StringShinglesImpl.compute($v, $k);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Unicode normalization (NFC / NFKC / NFD / NFKD) — the standard
    * first step of multilingual corpus cleaning (composed/decomposed
    * accents and compatibility ligatures otherwise defeat exact and
    * shingle dedup). ASCII/already-normalized rows take the
    * `isNormalized` fast path and return the input buffer unchanged —
    * on a mostly-ASCII corpus the per-row cost is one scan. */
  case class UnicodeNormalize(child: Expression, form: String) extends UnaryExpression {
    require(Set("NFC", "NFKC", "NFD", "NFKD")(form), s"unknown form $form")
    override def dataType: DataType = StringType
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(a: Any): Any =
      UnicodeNormalizeImpl.normalize(a.asInstanceOf[UTF8String], form)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v =>
        s"""${ev.value} = graft.functions.UnicodeNormalizeImpl.normalize($v, "$form");""")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** BPE segmentation of ONE (pre-normalized) word into subword
    * symbols, applying trained merge rules in rank order, each
    * greedily left-to-right — EXACTLY the fold [[graft.operators
    * .Pipeline.bpeTrain]] applies during training, so encoding a
    * training-vocab word reproduces the training's final symbol
    * sequence by construction. Unseen words degrade to characters;
    * symbols always concatenate back to the input word.
    *
    * The rule table is per-expression constant state, handed to
    * codegen as a referenced object (a flat String[] — janino-
    * resolvable, unlike a Scala Seq) — cost is O(rules · len) per
    * word with zero per-row allocation of the table. Inside a
    * higher-order `transform` the interpreted eval path runs; both
    * paths share [[BpeEncodeImpl.encode]]. */
  case class BpeEncodeWord(child: Expression, rules: Seq[(String, String)])
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullIntolerant: Boolean = true

    private lazy val flat: Array[String] =
      rules.flatMap(lr => Seq(lr._1, lr._2)).toArray

    override def nullSafeEval(a: Any): Any =
      BpeEncodeImpl.encode(a.asInstanceOf[UTF8String], flat)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val tbl = ctx.addReferenceObj("bpeRules", flat, "java.lang.String[]")
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = graft.functions.BpeEncodeImpl.encode($v, $tbl);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column API: BPE-encode one word column into subword symbols. */
  def bpeEncodeWord(word: Column, rules: Seq[(String, String)]): Column =
    Bridge.column(BpeEncodeWord(Bridge.expression(word), rules))

  /** Column API: Unicode-normalize a string column. */
  def unicodeNormalize(text: Column, form: String = "NFC"): Column =
    Bridge.column(UnicodeNormalize(Bridge.expression(text), form))

  /** Deflate compression ratio (compressed bytes / raw bytes) — the
    * Gopher/RefinedWeb "too compressible = templated/spammy, too
    * incompressible = random noise" quality signal. No SQL oracle
    * exists (DuckDB has no deflate), so this is spec-pinned and
    * benched, not gated. One streaming Deflater pass per row, output
    * length only — nothing is buffered. */
  case class DeflateRatio(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(a: Any): Any =
      DeflateImpl.ratio(a.asInstanceOf[UTF8String])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = graft.functions.DeflateImpl.ratio($v);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column API: deflate compression ratio of a string column. */
  def deflateRatio(text: Column): Column =
    Bridge.column(DeflateRatio(Bridge.expression(text)))

  /** Column API: string word-shingles of the normalized text. */
  def stringShingles(normalizedText: Column, k: Int): Column =
    Bridge.column(StringShingles(Bridge.expression(normalizedText), k))

  /** Column API: full MinHash signature of the normalized text. */
  def minhashSignature(normalizedText: Column, k: Int, numHashes: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(normalizedText), k, numHashes))

  /** Column API: LSH band hashes of the normalized text. */
  def minhashBands(normalizedText: Column, k: Int, numHashes: Int, numBands: Int): Column =
    Bridge.column(MinHashBandHashes(Bridge.expression(normalizedText), k, numHashes, numBands))
}

/** Top-level static forwarder target for [[TextExpressions.DeflateRatio]]. */
object DeflateImpl {
  // One native Deflater per task thread, reset() between rows: the
  // zlib stream init/teardown of a per-row `new Deflater` dominates
  // the cost of compressing short documents. ThreadLocal is the right
  // scope — expression eval is single-threaded per task, and distinct
  // tasks run on distinct executor threads. The Deflater (and its
  // zlib native buffer, ~few hundred KB) lives for the thread's
  // lifetime; Spark executors run a FIXED task-thread pool
  // (spark.executor.cores threads, reused across tasks), so retained
  // native memory is bounded by cores × buffer, not task count. In a
  // thread-churning host JVM, call end() from a thread-exit hook or
  // accept the GC-time finalizer zlib installs.
  private val deflater: ThreadLocal[java.util.zip.Deflater] =
    ThreadLocal.withInitial(() => new java.util.zip.Deflater(6, true))

  /** compressed/raw byte ratio at deflate level 6 (zlib default — the
    * level the quality-filter literature assumes). Empty → 1.0. */
  def ratio(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.length == 0) return 1.0
    val d = deflater.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total.toDouble / bytes.length
  }
}

/** Top-level so whole-stage codegen can call the Java static
  * forwarder `graft.functions.BpeEncodeImpl.encode` directly. */
object BpeEncodeImpl {
  /** Apply merge rules (flat [l0,r0,l1,r1,…], rank order) to one word.
    * Per rule: one greedy left-to-right pass — if the last emitted
    * symbol equals l and the incoming equals r, the last becomes l+r
    * (the merged symbol immediately re-eligible against the NEXT
    * incoming token, mirroring the training fold exactly). Initial
    * symbols are Unicode code points (the training's
    * substring-by-character split). */
  def encode(word: UTF8String, rules: Array[String]): GenericArrayData = {
    val w = word.toString
    val n = w.codePointCount(0, w.length)
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    var syms = new java.util.ArrayList[String](n)
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      syms.add(new String(Character.toChars(cp)))
      i += Character.charCount(cp)
    }
    var k = 0
    while (k < rules.length && syms.size > 1) {
      val l = rules(k); val r = rules(k + 1)
      val next = new java.util.ArrayList[String](syms.size)
      var j = 0
      while (j < syms.size) {
        val s = syms.get(j)
        if (!next.isEmpty && next.get(next.size - 1) == l && s == r)
          next.set(next.size - 1, l + r)
        else next.add(s)
        j += 1
      }
      syms = next
      k += 2
    }
    val out = new Array[Any](syms.size)
    var m = 0
    while (m < syms.size) { out(m) = UTF8String.fromString(syms.get(m)); m += 1 }
    new GenericArrayData(out)
  }
}

/** Top-level so whole-stage codegen can call the Java static
  * forwarder `graft.functions.UnicodeNormalizeImpl.normalize` directly
  * (the nested-object Java name is unresolvable by janino). */
object UnicodeNormalizeImpl {
  import java.text.Normalizer

  def normalize(s: UTF8String, form: String): UTF8String = {
    val f = Normalizer.Form.valueOf(form)
    val str = s.toString
    // isNormalized is a cheap scan that short-circuits on ASCII —
    // avoids re-encoding the overwhelmingly-normalized common case
    if (Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(Normalizer.normalize(str, f))
  }
}

/** Top-level so whole-stage codegen can call the Java static
  * forwarder `graft.functions.ShingleHashImpl.compute` directly. */
object ShingleHashImpl {
  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L
  private final val Mix = 0x9e3779b97f4a7c15L

  /** token FNV-1a over UTF-16 chars; shingle = ordered mix of the
    * last k token hashes. */
  def compute(s: String, k: Int): Array[Long] = {
      val tokenHashes = new scala.collection.mutable.ArrayBuffer[Long](32)
      var h = FnvOffset
      var inTok = false
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == ' ') {
          if (inTok) { tokenHashes += h; h = FnvOffset; inTok = false }
        } else {
          h = (h ^ c) * FnvPrime
          inTok = true
        }
        i += 1
      }
      if (inTok) tokenHashes += h
      val n = tokenHashes.length
      if (n == 0) return Array(FnvOffset)
      if (n < k) {
        var all = FnvOffset
        var j = 0
        while (j < n) { all = all * Mix ^ tokenHashes(j); j += 1 }
        return Array(all)
      }
      val out = new Array[Long](n - k + 1)
      var start = 0
      while (start <= n - k) {
        var sh = FnvOffset
        var j = start
        while (j < start + k) { sh = sh * Mix ^ tokenHashes(j); j += 1 }
        out(start) = sh
        start += 1
      }
      out
  }
}

/** Top-level (Java static forwarders, codegen-reachable) MinHash
  * signature math. Per-seed hash family matches Spark's
  * `xxhash64(longCol, lit(intSeed))` exactly:
  * XXH64.hashInt(seed_j, XXH64.hashLong(shingle_hash, 42L)). */
object MinHashImpl {
  import org.apache.spark.sql.catalyst.expressions.XXH64

  def signature(s: String, k: Int, numHashes: Int): Array[Long] = {
    val hs = ShingleHashImpl.compute(s, k)
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < hs.length) {
      val base = XXH64.hashLong(hs(i), 42L)
      var j = 0
      while (j < numHashes) {
        val v = XXH64.hashInt(j, base)
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    sig
  }

  private[graft] def tokenize(s: String): Array[String] =
    if (s.isEmpty) Array("") else s.split(' ')

  /** Band hashes of [[signature]]: band b = xxh64 chain seeded with
    * hashInt(b, 42) folded over rows [b*r, b*r+r) — identical to
    * Spark's `xxhash64(lit(b), slice(sig, b*r+1, r))`. */
  def bands(s: String, k: Int, numHashes: Int, numBands: Int): Array[Long] = {
    val sig = signature(s, k, numHashes)
    val r = numHashes / numBands
    val out = new Array[Long](numBands)
    var b = 0
    while (b < numBands) {
      var h = XXH64.hashInt(b, 42L)
      var j = b * r
      while (j < b * r + r) { h = XXH64.hashLong(sig(j), h); j += 1 }
      out(b) = h
      b += 1
    }
    out
  }
}

/** Top-level (Java static forwarders, codegen-reachable) string
  * shingling. Byte-level scan: 0x20 never occurs inside a UTF-8
  * multibyte sequence, so token boundaries are exact without
  * decoding; each shingle is one UTF8String.fromBytes slice. */
object StringShinglesImpl {
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  def compute(s: UTF8String, k: Int): GenericArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    // token start offsets (single-space-separated normalized text)
    var numToks = 1
    var i = 0
    while (i < n) { if (bytes(i) == 0x20) numToks += 1; i += 1 }
    if (numToks < k)
      return new GenericArrayData(Array[Any](UTF8String.fromBytes(bytes)))
    val starts = new Array[Int](numToks)
    val ends = new Array[Int](numToks)
    var t = 0
    starts(0) = 0
    i = 0
    while (i < n) {
      if (bytes(i) == 0x20) { ends(t) = i; t += 1; starts(t) = i + 1 }
      i += 1
    }
    ends(t) = n
    val out = new Array[Any](numToks - k + 1)
    var j = 0
    while (j <= numToks - k) {
      out(j) = UTF8String.fromBytes(bytes, starts(j), ends(j + k - 1) - starts(j))
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Top-level (Java static forwarders, codegen-reachable) SimHash math.
  * Token hashes are pinned to the composable forms they replace:
  *  - xx: `xxhash64(stringCol)` = XXH64.hashUTF8String(tok, 42)
  *  - md5: hi/lo 32-bit halves of the first 16 md5-hex chars =
  *    the first 8 digest bytes big-endian (what
  *    `shiftleft(conv(substring(md5,1,8),16,10), 32) | conv(...9,8...)`
  *    computes — and what the DuckDB oracle rebuilds). */
object SimHashImpl {
  import org.apache.spark.sql.catalyst.expressions.XXH64

  private val md5Digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def tokenHash(tok: String, useMd5: Boolean): Long =
    if (useMd5) {
      val d = md5Digest.get()
      d.reset()
      val bytes = d.digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.ByteBuffer.wrap(bytes).getLong // first 8 bytes, big-endian
    } else {
      XXH64.hashUTF8String(UTF8String.fromString(tok), 42L)
    }

  def signature(s: String, useMd5: Boolean): Long = {
    val toks = MinHashImpl.tokenize(s)
    val counts = new Array[Int](64)
    var t = 0
    while (t < toks.length) {
      val h = tokenHash(toks(t), useMd5)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
        i += 1
      }
      t += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) { if (counts(i) >= 0) sig |= (1L << i); i += 1 }
    sig
  }
}
