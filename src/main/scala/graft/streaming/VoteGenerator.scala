package graft.streaming

import scala.util.Random

/** Deterministic stand-in for the reference's ingest plumbing
  * (`main.py` HTTP fetch + Kafka produce, `voting.py` vote generation).
  * Seeded like the reference (`main.py:26` uses `random.seed(21)`), so
  * fixtures are reproducible without network or Kafka.
  *
  * Replicates the producer-side projections:
  *  - P-7 name/address concat (`main.py:103,155,160`)
  *  - P-9 alternating gender (`main.py:96`)
  *  - P-10 party = "Party "+(n % total + 1) (`main.py:104`)
  *  - P-11 event-time stamp 'yyyy-MM-dd HH:mm:ss' UTC (`voting.py:72`)
  *  - P-12 vote = 1 literal (`voting.py:73`)
  *  - J-1 random candidate choice (`voting.py:68`)
  *  - drift: emits `registered_age` + `email` (absent from VoteSchema →
  *    dropped), never emits `registered_date` (→ null). `main.py:165,168`
  */
object VoteGenerator {
  private val states = Vector("England", "Scotland", "Wales", "Northern Ireland", "Cornwall")

  case class Candidate(id: String, name: String, party: String, photoUrl: String)

  def candidates(n: Int = 3): Seq[Candidate] =
    (0 until n).map { i =>
      Candidate(s"cand-$i", s"Candidate $i", s"Party ${i % n + 1}", s"https://photo/c$i.jpg")
    }

  private def jsonStr(v: String): String =
    "\"" + v.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** One vote event as the JSON payload `voting.py:85–90` would put on
    * `votes_topic`: voter ⋈ candidate ⊎ {voting_time, vote}. Event time
    * advances one second per event from a fixed epoch.
    */
  def voteJson(i: Int, rng: Random, cands: Seq[Candidate],
               baseEpochSec: Long = 1700000000L, tsOffsetSec: Option[Long] = None): String = {
    val c = cands(rng.nextInt(cands.length))
    val ts = java.time.Instant.ofEpochSecond(baseEpochSec + tsOffsetSec.getOrElse(i.toLong))
    val tsStr = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
      .withZone(java.time.ZoneOffset.UTC).format(ts)
    val gender = if (i % 2 == 1) "female" else "male"
    val fields = Seq(
      "voter_id" -> jsonStr(s"voter-$i"),
      "candidate_id" -> jsonStr(c.id),
      "voting_time" -> jsonStr(tsStr),
      "voter_name" -> jsonStr(s"First$i Last$i"),
      "party_affiliation" -> jsonStr(c.party),
      "biography" -> jsonStr("A brief biography"),
      "campaign_platform" -> jsonStr("Key campaign promises"),
      "photo_url" -> jsonStr(c.photoUrl),
      "candidate_name" -> jsonStr(c.name),
      "date_of_birth" -> jsonStr(f"19${50 + i % 50}%02d-01-15"),
      "gender" -> jsonStr(gender),
      "nationality" -> jsonStr("British"),
      "registration_number" -> jsonStr(f"reg-$i%06d"),
      "address_street" -> jsonStr(s"${100 + i} High Street"),
      "address_city" -> jsonStr(s"City${i % 10}"),
      "address_state" -> jsonStr(states(i % states.length)),
      "address_country" -> jsonStr("United Kingdom"),
      "address_postcode" -> jsonStr(f"PC$i%05d"),
      "email" -> jsonStr(s"voter$i@example.co.uk"),       // drift: dropped by schema
      "phone_number" -> jsonStr(f"07${i}%09d"),
      "picture" -> jsonStr(s"https://photo/v$i.jpg"),
      "registered_age" -> (18 + i % 60).toString,          // drift: dropped by schema
      "vote" -> "1"
    )
    fields.map { case (k, v) => jsonStr(k) + ": " + v }.mkString("{", ", ", "}")
  }

  /** n events, optionally with duplicate (voter,candidate) pairs
    * appended — the S-6 dedup fixture (`voting.py:78–96`).
    */
  def votes(n: Int, seed: Int = 21, nCandidates: Int = 3, duplicates: Int = 0): Seq[String] = {
    val rng = new Random(seed)
    val cands = candidates(nCandidates)
    val base = (0 until n).map(i => voteJson(i, rng, cands))
    // duplicates re-emit the first `duplicates` voters' events (same
    // voter_id; candidate re-drawn with the SAME rng stream position,
    // so some dup pairs collide and some don't — like real replays).
    val dups = (0 until duplicates).map(i => voteJson(i, rng, cands))
    base ++ dups
  }
}
