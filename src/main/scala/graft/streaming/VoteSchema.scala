package graft.streaming

import org.apache.spark.sql.types._

/** The canonical 22-field vote-event schema, replicated field-for-field
  * from the reference (`spark_stream.py:15–38`): all nullable, all
  * strings except `voting_time: timestamp` and `vote: int`.
  *
  * Schema-drift semantics preserved as-is (SURVEY.md §1.2):
  *  - the producer emits `registered_age` + `email` (`main.py:165,168`)
  *    which are ABSENT here → `from_json` silently drops them;
  *  - `registered_date` is declared here but never produced
  *    (`spark_stream.py:36`) → always null downstream.
  */
object VoteSchema {
  val schema: StructType = StructType(Seq(
    StructField("voter_id", StringType),
    StructField("candidate_id", StringType),
    StructField("voting_time", TimestampType),
    StructField("voter_name", StringType),
    StructField("party_affiliation", StringType),
    StructField("biography", StringType),
    StructField("campaign_platform", StringType),
    StructField("photo_url", StringType),
    StructField("candidate_name", StringType),
    StructField("date_of_birth", StringType),
    StructField("gender", StringType),
    StructField("nationality", StringType),
    StructField("registration_number", StringType),
    StructField("address_street", StringType),
    StructField("address_city", StringType),
    StructField("address_state", StringType),
    StructField("address_country", StringType),
    StructField("address_postcode", StringType),
    StructField("phone_number", StringType),
    StructField("picture", StringType),
    StructField("registered_date", StringType),
    StructField("vote", IntegerType)
  ))
}
