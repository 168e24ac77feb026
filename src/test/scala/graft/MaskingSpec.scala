package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Masking

/** U-1 property tests (SURVEY.md §5.2 item 3c): masking is deterministic,
  * field-name-driven (case-insensitive), reaches every depth including
  * structs inside arrays, leaves unknown fields untouched, and maps nulls
  * to nulls. Field kinds mirror /root/reference/src/sanitizer.py:6-38.
  */
class MaskingSpec extends AnyFunSuite {
  lazy val spark = graft.core.Sessions.local(4, "masking-spec")

  private def docs(jsons: String*) =
    spark.read.json(spark.createDataset(jsons)(org.apache.spark.sql.Encoders.STRING))

  private val employee =
    """{"id":"emp-1","Email":"alice@real.com","SSN":"123-45-6789",
       |"payRate":72.5,"note":"keep me",
       |"location":{"line1":"1 Real St","city":"Realville","state":"CA","postalCode":"94000"},
       |"contacts":[{"name":"Bob Real","phoneNumber":"555-0100"}]}""".stripMargin.replace("\n", "")

  test("masking is deterministic and changes PII values") {
    val df = docs(employee)
    val a = Masking(df).select(to_json(struct(col("*")))).head.getString(0)
    val b = Masking(df).select(to_json(struct(col("*")))).head.getString(0)
    assert(a == b, "same input must mask identically")
    assert(!a.contains("alice@real.com") && !a.contains("123-45-6789"))
    assert(a.contains("@masked.example"))
  }

  test("match is case-insensitive (sanitizer.py:49) and unknown fields pass through") {
    val out = Masking(docs(employee))
    val row = out.head
    // "Email" (mixed case) masked; "note" and "id" untouched
    assert(row.getAs[String]("Email").endsWith("@masked.example"))
    assert(row.getAs[String]("note") == "keep me")
    assert(row.getAs[String]("id") == "emp-1")
  }

  test("a matched container field is replaced wholesale, not recursed") {
    // the reference replaces an "address" DICT with faker.address() — a
    // string (sanitizer.py:50-52); the schema-driven masker does the same
    val df = docs("""{"id":"1","address":{"line1":"1 Real St","city":"X"}}""")
    val masked = Masking(df)
    assert(masked.schema("address").dataType ==
      org.apache.spark.sql.types.StringType)
    assert(masked.head.getAs[String]("address").contains(" Masked St"))
  }

  test("masking reaches nested structs and structs inside arrays") {
    val row = Masking(docs(employee)).head
    val addr = row.getAs[org.apache.spark.sql.Row]("location")
    assert(addr.getAs[String]("line1").endsWith(" Masked St"))
    assert(addr.getAs[String]("city").startsWith("City"))
    assert(addr.getAs[String]("state").startsWith("State"))
    assert(addr.getAs[String]("postalCode").matches("\\d{5}"))
    val contact = row.getSeq[org.apache.spark.sql.Row](row.fieldIndex("contacts")).head
    assert(contact.getAs[String]("name").startsWith("Fn"))
    assert(contact.getAs[String]("phoneNumber").startsWith("+1-"))
  }

  test("numeric kinds stay numeric and in the Faker ranges") {
    val row = Masking(docs(employee)).head
    val pay = row.getAs[Double]("payRate")
    assert(pay >= 15.0 && pay <= 150.0, s"payrate $pay outside Faker range")
  }

  test("null PII values stay null") {
    val row = Masking(docs("""{"id":"1","email":null,"ssn":null}""")).head
    assert(row.isNullAt(row.fieldIndex("email")))
    assert(row.isNullAt(row.fieldIndex("ssn")))
  }

  test("equal inputs mask equal; different inputs mask different") {
    val df = docs(
      """{"id":"1","email":"same@x.com"}""",
      """{"id":"2","email":"same@x.com"}""",
      """{"id":"3","email":"other@x.com"}""")
    val vals = Masking(df).orderBy("id").collect().map(_.getAs[String]("email"))
    assert(vals(0) == vals(1), "joinability: equal values must mask equal")
    assert(vals(0) != vals(2))
  }

  test("map values are masked by their runtime key") {
    import spark.implicits._
    val df = Seq(("1", Map("email" -> "real@x.com", "note" -> "keep")))
      .toDF("id", "attrs")
    val m = Masking(df).head.getAs[Map[String, String]]("attrs")
    assert(m("email").endsWith("@masked.example"))
    assert(m("note") == "keep")
  }

  test("every reference field kind has a generator (31 kinds, sanitizer.py:6-38)") {
    val expected = Set(
      "firstname", "lastname", "fullname", "name", "ssn", "phonenumber",
      "mobilenumber", "email", "workemail", "personalemail", "address",
      "street", "city", "state", "postalcode", "zip", "jobtitle",
      "department", "dateofbirth", "managerid", "insurance", "taxid",
      "accountname", "accountnumber", "routingnumber", "line1", "line2",
      "countyname", "countyfips", "ratingarea", "payrate")
    assert(Masking.generators.keySet == expected)
  }

  test("masking plan is UDF-free (stays in whole-stage codegen)") {
    val plan = Masking(docs(employee)).queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("batchevalpython"))
    assert(!plan.contains("ScalaUDF"))
  }
}
