package graft

import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String) = Seq(Tuple1(text)).toDF("t")

  test("normText lowercases, collapses whitespace, trims") {
    val r = one("  The   QUICK\tbrown\n fox ").select(T.normText(col("t"))).head.getString(0)
    assert(r == "the quick brown fox")
  }

  test("tokenCount and subword estimate") {
    val r = one("one two  three").select(
      T.tokenCount(col("t")), T.subwordEstimate(col("t"))).head
    assert(r.getInt(0) == 3)
    assert(r.getLong(1) == math.ceil(14 / 4.0).toLong)
  }

  test("wordOccurrences counts standalone tokens only") {
    val r = one("the theatre the them THE").select(T.wordOccurrences(col("t"), "the")).head.getInt(0)
    assert(r == 3) // 'the' x2 lowercase + 'THE' normalized; not theatre/them
  }

  test("punctCount") {
    assert(one("a,b.c!?").select(T.punctCount(col("t"))).head.getInt(0) == 4)
  }

  test("langId picks dominant marker language, und when none") {
    assert(one("the cat and the dog of the house").select(T.langId(col("t"))).head.getString(0) == "en")
    assert(one("der hund und die katze und das haus").select(T.langId(col("t"))).head.getString(0) == "de")
    assert(one("xyzzy plugh 42").select(T.langId(col("t"))).head.getString(0) == "und")
  }

  test("shingles: k-grams, short doc degenerates to whole text") {
    val r = one("a b c d").select(T.shingles(col("t"), 3)).head.getSeq[String](0)
    assert(r == Seq("a b c", "b c d"))
    val short = one("a b").select(T.shingles(col("t"), 3)).head.getSeq[String](0)
    assert(short == Seq("a b"))
  }

  test("StringShingles expression is bit-identical to the transform/slice/concat_ws form") {
    val texts = Seq("a b c d e", "a b", "", "Héllo wörld again naïve test",
      "  Mixed   CASE\twith\nodd   spacing  ", "single")
    val df = texts.toDF("t")
    for (k <- Seq(2, 3, 5)) {
      val t = T.tokens(col("t"))
      val idx = sequence(lit(0), greatest(size(t) - k, lit(0)))
      val composable = when(size(t) < k, array(concat_ws(" ", t)))
        .otherwise(transform(idx, i => concat_ws(" ", slice(t, i + 1, lit(k)))))
      val both = df.select(T.shingles(col("t"), k).as("native"), composable.as("ref"))
        .as[(Seq[String], Seq[String])].collect()
      both.foreach { case (n, r) => assert(n == r, s"k=$k") }
    }
  }

  test("repetitionRatio: 0 for unique text, high for templated text") {
    val unique = one("one two three four five six").select(T.repetitionRatio(col("t"))).head.getDouble(0)
    assert(unique == 0.0)
    val looped = one(Seq.fill(10)("spam ham eggs").mkString(" "))
      .select(T.repetitionRatio(col("t"))).head.getDouble(0)
    assert(looped > 0.85) // 28 3-grams, only 3 distinct
    val short = one("a b").select(T.repetitionRatio(col("t"))).head.getDouble(0)
    assert(short == 0.0) // degenerate single whole-text shingle
  }

  test("fingerprint equal for normalization-equivalent docs") {
    val df = Seq(("A  B\tC"), ("a b c")).toDF("t").select(T.fingerprint(col("t")).as("f"))
    assert(df.distinct().count == 1)
  }

  test("unicodeNormalize: NFC composes, NFKC folds compatibility, ASCII is identity") {
    import graft.functions.TextExpressions.unicodeNormalize
    val decomposed = "e\u0301cole" // e + COMBINING ACUTE ACCENT
    val composed = "\u00e9cole"    // precomposed e-acute
    val ligature = "\ufb01le"      // fi ligature + "le"
    val df = Seq((decomposed, composed, "plain ascii", ligature)).toDF("d", "c", "a", "lig")
    val r = df.select(
      unicodeNormalize(col("d"), "NFC").as("nfc_d"),
      unicodeNormalize(col("c"), "NFD").as("nfd_c"),
      unicodeNormalize(col("a"), "NFC").as("nfc_a"),
      unicodeNormalize(col("lig"), "NFKC").as("nfkc_lig"),
      unicodeNormalize(col("lig"), "NFC").as("nfc_lig")).head
    assert(r.getString(0) == composed)      // NFC composes the pair
    assert(r.getString(1) == decomposed)    // NFD decomposes back
    assert(r.getString(2) == "plain ascii") // identity fast path
    assert(r.getString(3) == "file")        // NFKC folds the fi ligature
    assert(r.getString(4) == ligature)      // NFC leaves compatibility chars
  }

  test("deflateRatio: templated text compresses far below varied text") {
    import graft.functions.TextExpressions.deflateRatio
    val spam = Seq.fill(200)("buy now").mkString(" ")
    val varied = (1 to 200).map(i => s"tok${i * 7919}").mkString(" ")
    val r = Seq((spam, varied, "")).toDF("s", "v", "e")
      .select(deflateRatio(col("s")), deflateRatio(col("v")), deflateRatio(col("e"))).head
    assert(r.getDouble(0) < 0.1)                       // near-pure repetition
    assert(r.getDouble(1) > r.getDouble(0) * 3)        // varied ≫ templated
    assert(r.getDouble(2) == 1.0)                      // empty sentinel
  }

  test("stripHtml: tags out, script/style content out, entities decoded once") {
    val html = """<html><head><style>p { color: red }</style></head>
      |<body><h1 id="t">Title</h1>
      |<script type="text/javascript">var x = "<p>not text</p>";</script>
      |<p class="a">Hello &amp; welcome &lt;here&gt;&nbsp;&quot;now&quot; &#39;ok&#39;</p>
      |<p>&amp;lt; stays encoded</p></body></html>""".stripMargin
    val r = one(html).select(T.stripHtml(col("t"))).head.getString(0)
    assert(r == """Title Hello & welcome <here> "now" 'ok' &lt; stays encoded""")
    // script/style CONTENT never leaks (not even the quoted "<p>")
    assert(!r.contains("var x") && !r.contains("color"))
    // malformed markup degrades to tag-stripping, never throws
    val bad = one("a <b unclosed attr='x b < c </p whatever> d")
      .select(T.stripHtml(col("t"))).head.getString(0)
    assert(bad.startsWith("a") && bad.endsWith("d"))
    // plain text is (whitespace-collapsed) identity
    val plain = one("  no  markup here  ").select(T.stripHtml(col("t"))).head.getString(0)
    assert(plain == "no markup here")
  }

  test("scriptCounts: exact per-script counts, earliest-argmax dominant, none on empty") {
    def sc(s: String) = one(s).select(T.scriptCounts(col("t")).as("c"))
      .select("c.n_latin", "c.n_cyrillic", "c.n_greek", "c.n_arabic",
        "c.n_cjk", "c.n_digit", "c.main_script").head
    val mixed = sc("hello мир 世界 αβ ٣٤ 42")
    assert((mixed.getInt(0), mixed.getInt(1), mixed.getInt(2), mixed.getInt(3),
      mixed.getInt(4), mixed.getInt(5)) == ((5, 3, 2, 2, 2, 2)))
    assert(mixed.getString(6) == "latin")
    // Arabic-Indic digits ٣٤ land in the Arabic block, not [0-9]
    assert(sc("٣٤").getInt(3) == 2 && sc("٣٤").getInt(5) == 0 &&
      sc("٣٤").getString(6) == "arabic")
    assert(sc("привет мир").getString(6) == "cyrillic")
    assert(sc("ひらがな と 漢字").getString(6) == "cjk") // hiragana + han both in the cjk class
    // tie goes to the earlier-listed script: 2 latin vs 2 cyrillic
    assert(sc("ab мы").getString(6) == "latin")
    // no script characters at all
    assert(sc(" .,;! ").getString(6) == "none")
    assert(sc("12345").getString(6) == "digit")
  }

  test("qualityStruct fields are sane") {
    val r = one("The quick, brown fox!").select(T.qualityStruct(col("t")).as("q"))
      .select("q.n_chars", "q.n_tokens", "q.punct_ratio", "q.stopword_ratio").head
    assert(r.getInt(0) == 21)
    assert(r.getInt(1) == 4)
    assert(r.getDouble(2) > 0 && r.getDouble(2) < 0.2)
    assert(r.getDouble(3) == 0.25)
  }
}
