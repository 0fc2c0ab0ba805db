package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.util.Random

/**
 * Deterministic stand-in for the reference's HTTP-poll producer
 * (`/root/reference/producer.py:17-27` — randomuser.me GET every 5 s):
 * a seeded generator emitting the same envelope shape as the API, suitable
 * for file/MemoryStream sources in the zero-network test environment.
 *
 * Same seed → identical documents, so golden tests and cross-run
 * comparisons are exact.
 */
object EnvelopeGenerator {

  private val FirstNames = Vector("Ada", "Grace", "Alan", "Edsger", "Barbara",
    "Donald", "Leslie", "Margaret", "John", "Radia")
  private val LastNames = Vector("Lovelace", "Hopper", "Turing", "Dijkstra",
    "Liskov", "Knuth", "Lamport", "Hamilton", "Backus", "Perlman")
  private val Cities = Vector("London", "Paris", "Rabat", "Casablanca", "Lyon")
  private val States = Vector("England", "IDF", "RSK", "Casa", "ARA")
  private val Countries = Vector("United Kingdom", "France", "Morocco")
  private val Genders = Vector("female", "male")
  private val Domains = Vector("example.com", "mail.org", "web.net")

  /** One randomuser.me-shaped envelope; `resultsPerDoc` elements. */
  def envelope(rng: Random, resultsPerDoc: Int = 1): String = {
    val results = Seq.fill(resultsPerDoc)(result(rng)).mkString(",")
    s"""{"results":[$results]}"""
  }

  private def result(rng: Random): String = {
    val first = FirstNames(rng.nextInt(FirstNames.size))
    val last = LastNames(rng.nextInt(LastNames.size))
    val gender = Genders(rng.nextInt(2))
    val year = 1950 + rng.nextInt(60)
    val month = 1 + rng.nextInt(12)
    val day = 1 + rng.nextInt(28)
    val dob = f"$year-$month%02d-$day%02dT00:00:00.000Z"
    val regYear = 2010 + rng.nextInt(14)
    val uuid = new java.util.UUID(rng.nextLong(), rng.nextLong()).toString
    val city = Cities(rng.nextInt(Cities.size))
    val state = States(rng.nextInt(States.size))
    val country = Countries(rng.nextInt(Countries.size))
    val email = s"${first.toLowerCase}.${last.toLowerCase}@${Domains(rng.nextInt(Domains.size))}"
    s"""{"gender":"$gender",
       |"name":{"title":"Ms","first":"$first","last":"$last"},
       |"dob":{"date":"$dob","age":${2023 - year}},
       |"location":{"street":{"number":${1 + rng.nextInt(999)},"name":"Main St"},
       |"city":"$city","state":"$state","country":"$country","postcode":${1000 + rng.nextInt(9000)}},
       |"email":"$email",
       |"login":{"uuid":"$uuid","username":"${first.toLowerCase}${rng.nextInt(100)}"},
       |"registered":{"date":"$regYear-07-02T11:22:33.444Z"}}""".stripMargin.replaceAll("\n", "")
  }

  /** Generate `n` envelopes with a fixed seed. */
  def generate(n: Int, seed: Long = 42L, resultsPerDoc: Int = 1): Seq[String] = {
    val rng = new Random(seed)
    Seq.fill(n)(envelope(rng, resultsPerDoc))
  }

  /** Write envelopes as newline-delimited JSON files under `dir` (one file
   * per `perFile` docs) — feeds `StreamingEtl.FileLinesSource`. */
  def writeFiles(dir: String, n: Int, perFile: Int = 100, seed: Long = 42L): Unit = {
    Files.createDirectories(Paths.get(dir))
    generate(n, seed).grouped(perFile).zipWithIndex.foreach { case (docs, i) =>
      Files.write(Paths.get(dir, f"envelopes-$i%05d.json"),
        docs.mkString("\n").getBytes(StandardCharsets.UTF_8))
    }
  }
}
