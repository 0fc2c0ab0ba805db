package graft

import java.sql.Date

import graft.ops.Transforms

/** Unit tests for the ETL spine (SURVEY.md §2.3) including the reference's
 * edge-case semantics: year-difference age, strict >18 boundary, null-key
 * drop, concat_ws null-skipping, explode of empty/missing arrays, PERMISSIVE
 * malformed-JSON handling. Fixture shapes per FIXTURES.md §A. */
class TransformsSpec extends SparkTestBase {
  import spark.implicits._

  private val asOf = Date.valueOf("2026-01-01")

  private def envelope(
      uuid: String = "u-1", first: String = "Ada", last: String = "Lovelace",
      dob: String = "1989-03-21T04:15:09.512Z", country: String = "\"UK\"",
      email: String = "ada@example.com"): String =
    s"""{"results":[{"gender":"female",
       |"name":{"title":"Ms","first":"$first","last":"$last"},
       |"dob":{"date":"$dob","age":36},
       |"location":{"street":{"number":221,"name":"Baker St"},
       |"city":"London","state":"England","country":$country,"postcode":1234},
       |"email":"$email",
       |"login":{"uuid":${if (uuid == null) "null" else s""""$uuid""""},"username":"adal"},
       |"registered":{"date":"2015-07-02T11:22:33.444Z"}}]}""".stripMargin.replaceAll("\n", "")

  private def run(docs: String*): Array[graft.schema.UserProfile] = {
    val raw = docs.toDF("value").select($"value".cast("binary").as("value"))
    Transforms.etlSpineTyped(raw, asOf).collect()
  }

  test("full spine: one envelope → one 9-column profile row") {
    val rows = run(envelope())
    assert(rows.length == 1)
    val r = rows.head
    assert(r.id == "u-1")
    assert(r.full_name == "Ada Lovelace")
    assert(r.age == 2026 - 1989)
    assert(r.full_address == "UK England London 221 1234")
    assert(r.inscription == "2015-07-02T11:22:33.444Z")
  }

  test("age is year-difference, not true age (reference quirk preserved)") {
    // Born Dec 31: true age on 2026-01-01 is 36, year-difference says 37.
    val rows = run(envelope(dob = "1989-12-31T00:00:00.000Z"))
    assert(rows.head.age == 37)
  }

  test("GDPR filter: strict >18 — 18-year-diff dropped, 19 kept") {
    assert(run(envelope(dob = "2008-06-15T00:00:00.000Z")).isEmpty)  // 18
    assert(run(envelope(dob = "2007-06-15T00:00:00.000Z")).length == 1)  // 19
  }

  test("null login.uuid rows are dropped (id IS NOT NULL)") {
    assert(run(envelope(uuid = null)).isEmpty)
  }

  test("concat_ws skips null components without double spaces") {
    val rows = run(envelope(country = "null"))
    assert(rows.head.full_address == "England London 221 1234")
  }

  test("multi-element and empty results arrays") {
    def element(uuid: String) = envelope(uuid = uuid)
      .stripPrefix("""{"results":[""").stripSuffix("]}")
    val multi = s"""{"results":[${element("u-1")},${element("u-2")}]}"""
    val rows = run(multi, """{"results":[]}""")
    assert(rows.map(_.id).sorted.toSeq == Seq("u-1", "u-2"))
  }

  test("malformed JSON yields no rows (PERMISSIVE nulls filtered)") {
    assert(run("""not json at all""").isEmpty)
  }

  test("pseudonymize replaces values with sha256 hex") {
    val df = Seq(("a@b.com", 1)).toDF("email", "n")
    val out = Transforms.pseudonymize(df, "email").collect().head.getString(0)
    assert(out.matches("[0-9a-f]{64}"))
  }

  test("emailDomain extracts registered domain") {
    val df = Seq("u@example.com", "u@mail.example.co", "u@plain.org")
      .toDF("email").select(Transforms.emailDomain($"email").as("d"))
    assert(df.as[String].collect().toSeq == Seq("example", "example", "plain"))
  }

  test("emailDomain honors two-label public suffixes (tldextract parity)") {
    val cases = Seq(
      "a@b.co.uk" -> "b",            // PSL two-label suffix
      "a@sub.b.co.uk" -> "b",        // subdomain under PSL suffix
      "a@b.com.au" -> "b",
      "a@co.example.com" -> "example", // 'co' as an ordinary label
      "a@b.io" -> "b")
    val df = cases.map(_._1).toDF("email")
      .select(Transforms.emailDomain($"email").as("d"))
    assert(df.as[String].collect().toSeq == cases.map(_._2))
  }

  test("emailDomain honors three-label PSL families and wildcards (tldextract parity)") {
    val cases = Seq(
      "a@b.pref.hokkaido.jp" -> "b",     // Japanese prefecture block
      "a@sub.b.pref.aichi.jp" -> "b",    // subdomain under it
      "a@b.city.osaka.jp" -> "b",        // designated-city literal block
      "a@b.metro.tokyo.jp" -> "b",
      "a@b.k12.ca.us" -> "b",            // US schools family
      "a@b.cc.ny.us" -> "b",             // US community-college family
      "a@b.lib.tx.us" -> "b",            // US libraries family
      "a@b.act.edu.au" -> "b",           // AU state education registry
      "a@b.nsw.gov.au" -> "b",           // AU state government registry
      "a@b.little.sch.uk" -> "b",        // *.sch.uk wildcard rule
      "a@b.co.jp" -> "b",                // 2-label still wins where no 3-label matches
      "a@pref.example.com" -> "example", // 'pref' as an ordinary label
      "a@city.example.org" -> "example", // 'city' as an ordinary label
      "a@b.k12.example.com" -> "example") // k12 outside .us is ordinary
    val df = cases.map(_._1).toDF("email")
      .select(Transforms.emailDomain($"email").as("d"))
    assert(df.as[String].collect().toSeq == cases.map(_._2))
  }

  test("emailDomain matches a reference PSL evaluator on generated hosts") {
    // Independent implementation of the same PSL semantics (string-split
    // arithmetic vs the column's substring_index expressions — the target
    // is an off-by-one in the nested substring_index counts) over a
    // representative sample of every rule category. Random labels are 5-8
    // chars so they can never collide with a rule label ('city', 'k12', …).
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val exceptions = Set("city.kobe.jp", "city.yokohama.jp")
    val wildcardParents = Set("sch.uk", "kobe.jp", "yokohama.jp")
    val lit3 = Set("pref.hokkaido.jp", "k12.ca.us", "city.osaka.jp",
      "metro.tokyo.jp")
    val lit2 = Set("co.uk", "com.au", "ne.jp", "gouv.fr")
    def ref(host: String): String = {
      val ls = host.split('.')
      def tail(n: Int) = ls.takeRight(n).mkString(".")
      def at(i: Int) = ls(math.max(i, 0))
      if (ls.length >= 3 && exceptions(tail(3))) at(ls.length - 3)
      else if ((ls.length >= 3 && lit3(tail(3))) ||
          (ls.length >= 2 && wildcardParents(tail(2)))) at(ls.length - 4)
      else if (ls.length >= 2 && lit2(tail(2))) at(ls.length - 3)
      else at(ls.length - 2)
    }
    val suffixes = Seq("com", "org", "io") ++ lit2 ++ lit3 ++
      wildcardParents ++ exceptions
    val genLabel = Gen.choose(5, 8)
      .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    val genHost = for {
      sfx <- Gen.oneOf(suffixes)
      extra <- Gen.choose(0, 3)
      labels <- Gen.listOfN(extra, genLabel)
    } yield (labels :+ sfx).mkString(".")
    val hosts = (1 to 300).flatMap(i =>
      genHost.apply(Gen.Parameters.default, Seed(i.toLong))).distinct
    val got = hosts.map(h => s"u@$h").toDF("email")
      .select($"email", Transforms.emailDomain($"email").as("d"))
      .as[(String, String)].collect().toMap
    hosts.foreach { h =>
      assert(got(s"u@$h") == ref(h), s"host $h")
    }
  }

  test("emailDomain honors PSL !-exception rules (tldextract parity)") {
    // `*.kobe.jp` makes every third label under kobe.jp a public suffix —
    // EXCEPT `!city.kobe.jp`, which the exception rule makes registrable:
    // the registered domain of anything under city.kobe.jp is city.kobe.jp
    // itself, so the extracted domain label is `city`.
    val cases = Seq(
      "a@www.city.kobe.jp" -> "city",    // exception wins over the wildcard
      "a@city.kobe.jp" -> "city",        // the registrable domain itself
      "a@x.y.city.sendai.jp" -> "city",  // deep subdomain under an exception
      "a@b.foo.kobe.jp" -> "b",          // wildcard: foo.kobe.jp is a suffix
      "a@sub.b.bar.yokohama.jp" -> "b",  // subdomain under a wildcard suffix
      "a@foo.kobe.jp" -> "foo",          // suffix-only host degrades
      "a@b.city.osaka.jp" -> "b",        // literal city.<x>.jp family (no
                                         // wildcard/exception for osaka)
      "a@city.example.org" -> "example") // 'city' as an ordinary label
    val df = cases.map(_._1).toDF("email")
      .select(Transforms.emailDomain($"email").as("d"))
    assert(df.as[String].collect().toSeq == cases.map(_._2))
  }
}
