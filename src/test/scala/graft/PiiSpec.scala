package graft

import graft.functions.PiiFunctions
import org.apache.spark.sql.functions._

class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String) = Seq(Tuple1(text)).toDF("t")

  test("detects emails, phones, and ips") {
    val df = one("mail a.user+tag@sub.example.co or call 555-123-4567 from 10.0.12.7 twice 555-000-1111")
    val r = df.select(
      PiiFunctions.emailCount(col("t")).as("e"),
      PiiFunctions.phoneCount(col("t")).as("p"),
      PiiFunctions.ipCount(col("t")).as("i")).head()
    assert(r.getInt(0) == 1 && r.getInt(1) == 2 && r.getInt(2) == 1)
  }

  test("clean text yields zero counts and is unchanged by scrub") {
    val df = one("just ordinary words with no contact details at all")
    val r = df.select(PiiFunctions.piiStruct(col("t")).as("s"), PiiFunctions.scrub(col("t")).as("c"))
      .select("s.n_emails", "s.n_phones", "s.n_ips", "s.has_pii", "c").head()
    assert(r.getInt(0) == 0 && r.getInt(1) == 0 && r.getInt(2) == 0 && !r.getBoolean(3))
    assert(r.getString(4) == "just ordinary words with no contact details at all")
  }

  test("scrub redacts every class and is idempotent") {
    val df = one("x user@example.com y 10.1.2.3 z 555-123-4567 w")
    val once = df.select(PiiFunctions.scrub(col("t")).as("c"))
    val s = once.head().getString(0)
    assert(s == "x [EMAIL] y [IP] z [PHONE] w")
    assert(once.select(PiiFunctions.scrub(col("c"))).head().getString(0) == s)
  }

  test("luhnValid matches known vectors; card scrub redacts only checksum-valid runs") {
    // classic Luhn vectors (length-generic)
    val vecs = Seq(
      "4111111111111111" -> true,   // the canonical valid test PAN
      "4111111111111112" -> false,  // off-by-one check digit
      "5500005555555559" -> true,
      "79927398713" -> true,        // the ISO worked example (11 digits)
      "79927398710" -> false)
    vecs.foreach { case (n, want) =>
      assert(one(n).select(PiiFunctions.luhnValid(col("t"))).head().getBoolean(0) == want,
        s"luhn($n) should be $want")
    }
    // detection counts candidates, validation separates real cards
    // from id-like digit runs; scrub touches only the valid one
    val df = one("pay 4111111111111111 ref 1234567890123456 end")
    val r = df.select(
      PiiFunctions.cardCandidateCount(col("t")).as("n"),
      PiiFunctions.cardCount(col("t")).as("v"),
      PiiFunctions.scrubCards(col("t")).as("s")).head()
    assert(r.getInt(0) == 2 && r.getInt(1) == 1)
    assert(r.getString(2) == "pay [CARD] ref 1234567890123456 end")
    // word boundary: a 17-digit run is not a card candidate
    assert(one("id 41111111111111110 x")
      .select(PiiFunctions.cardCandidateCount(col("t"))).head().getInt(0) == 0)
    // luhnValid is TOTAL: non-digit input and empty string are false,
    // never NULL (three-valued logic would misroute a NOT filter)
    Seq("4111-1111-1111-1111", "", "abc").foreach { bad =>
      val row = one(bad).select(PiiFunctions.luhnValid(col("t")).as("v"),
        (!PiiFunctions.luhnValid(col("t"))).as("nv")).head()
      assert(!row.isNullAt(0) && !row.getBoolean(0), s"luhn($bad)")
      assert(row.getBoolean(1), s"!luhn($bad) must be true, not NULL")
    }
    // the one-scan cardStruct equals the composable functions
    val cs = df.select(PiiFunctions.cardStruct(col("t")).as("c"))
      .select("c.n_cards", "c.n_valid", "c.scrubbed").head()
    assert(cs.getLong(0) == 2 && cs.getLong(1) == 1)
    assert(cs.getString(2) == r.getString(2))
  }

  test("email is scrubbed before its digit runs can be misread as ip/phone") {
    val s = one("reach 12.34.56.78x999-123-4567@a.bc now")
      .select(PiiFunctions.scrub(col("t"))).head().getString(0)
    // the email regex consumes the whole token (local part allows digits
    // and dots), so no partial [IP]/[PHONE] is carved out of an address
    assert(s == "reach [EMAIL] now")
    assert(!s.contains("[IP]") && !s.contains("[PHONE]"))
  }
}
