package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic PII masking (U-1) — the Spark re-expression of the
  * reference's Faker-based sanitizer (/root/reference/src/sanitizer.py:6-63).
  *
  * Semantics preserved from the reference:
  *   - field-NAME-driven: a fixed map of PII field kinds, matched
  *     case-insensitively on the lowered key (sanitizer.py:47-49);
  *   - matched fields are REPLACED, never recursed into (sanitizer.py:50-54);
  *   - unmatched container fields (structs, arrays, maps) are recursed
  *     (sanitizer.py:53-61) — including dicts inside lists;
  *   - unmatched scalars pass through untouched.
  *
  * Documented deviations (SURVEY.md §7.3 item 2): the reference draws RANDOM
  * Faker values — non-idempotent, untestable, and non-reproducible across
  * executors. Here every masked value is a pure function of the original:
  * `masked = template(kind, h)` where `h` is the 32-bit md5 prefix of the
  * original value's string form ([[Hashing.md5h32]] — portable to the DuckDB
  * oracle bit-for-bit). Masking is therefore deterministic, idempotent in
  * distribution (re-masking yields a stable value), and equal inputs mask
  * equal — which preserves joinability of masked keys. Nulls stay null
  * (the generator output, not a leak).
  *
  * Everything is built from codegen'd built-ins (md5/conv/concat/lpad) — no
  * UDF, so masking is a Project inside whole-stage codegen, pruned and
  * pushed like any other projection at 100 TB.
  */
object Masking {

  /** 32-bit unsigned seed from the original value. */
  private def seed(c: Column): Column =
    conv(substring(md5(c.cast(StringType)), 1, 8), 16, 10).cast(LongType)

  private def hex(c: Column, n: Int): Column =
    substring(md5(c.cast(StringType)), 1, n)

  private def digits(c: Column, n: Int): Column =
    lpad((seed(c) % math.pow(10, n).toLong).cast(StringType), n, "0")

  private def first(c: Column) = concat(lit("Fn"), hex(c, 6))
  private def last(c: Column)  = concat(lit("Ln"), hex(c, 6))
  private def full(c: Column)  = concat(first(c), lit(" "), last(c))
  private def ssn(c: Column) = concat(
    substring(digits(c, 9), 1, 3), lit("-"),
    substring(digits(c, 9), 4, 2), lit("-"),
    substring(digits(c, 9), 6, 4))
  private def phone(c: Column) = concat(
    lit("+1-"), substring(digits(c, 10), 1, 3), lit("-"),
    substring(digits(c, 10), 4, 3), lit("-"), substring(digits(c, 10), 7, 4))
  private def email(c: Column, domain: String) =
    concat(hex(c, 8), lit("@" + domain))
  private def street(c: Column) =
    concat(((seed(c) % 9899L) + 101L).cast(StringType), lit(" Masked St"))
  private def city(c: Column)   = concat(lit("City"), hex(c, 6))
  private def postal(c: Column) = digits(c, 5)
  private def isoDate(c: Column) = concat(
    (lit(1950) + seed(c) % 50).cast(StringType), lit("-"),
    lpad((lit(1) + seed(c) % 12).cast(StringType), 2, "0"), lit("-"),
    lpad((lit(1) + seed(c) % 28).cast(StringType), 2, "0"))
  private def uuid(c: Column) = {
    val h = md5(c.cast(StringType))
    concat(substring(h, 1, 8), lit("-"), substring(h, 9, 4), lit("-"),
      substring(h, 13, 4), lit("-"), substring(h, 17, 4), lit("-"),
      substring(h, 21, 12))
  }

  /** Field-kind → masking template. Keys are the reference's SANITIZE_FIELDS
    * map verbatim (sanitizer.py:6-38); templates mirror each Faker
    * generator's SHAPE (and output type) deterministically. */
  val generators: Map[String, Column => Column] = Map(
    "firstname"     -> first,
    "lastname"      -> last,
    "fullname"      -> full,
    "name"          -> full,
    "ssn"           -> ssn,
    "taxid"         -> ssn,
    "phonenumber"   -> phone,
    "mobilenumber"  -> phone,
    "email"         -> (c => email(c, "masked.example")),
    "workemail"     -> (c => email(c, "corp.example")),
    "personalemail" -> (c => email(c, "mail.example")),
    "address"       -> (c => concat(street(c), lit(", "), city(c),
                          lit(", "), postal(c))),
    "street"        -> street,
    "line1"         -> street,
    "line2"         -> (c => concat(lit("Unit "), (seed(c) % 999L + 1L).cast(StringType))),
    "city"          -> city,
    "countyname"    -> city,
    "state"         -> (c => concat(lit("State"), (seed(c) % 50L).cast(StringType))),
    "postalcode"    -> postal,
    "zip"           -> postal,
    "jobtitle"      -> (c => concat(lit("Role "), hex(c, 6))),
    "department"    -> (c => concat(lit("dept-"), hex(c, 6))),
    "dateofbirth"   -> isoDate,
    "managerid"     -> uuid,
    "insurance"     -> (c => concat(lit("INS-"), substring(digits(c, 8), 1, 4),
                          lit("-"), substring(digits(c, 8), 5, 4))),
    "accountname"   -> (c => concat(lit("Acme "), hex(c, 6))),
    "accountnumber" -> (c => concat(lit("BBAN"), digits(c, 12))),
    // numeric kinds keep numeric types, like the Faker originals
    "routingnumber" -> (c => (lit(100000000L) + seed(c) % 900000000L)),
    "countyfips"    -> (c => (lit(10000L) + seed(c) % 90000L)),
    "ratingarea"    -> (c => (lit(1L) + seed(c) % 5L)),
    "payrate"       -> (c => round(lit(15.0) + (seed(c) % 13500L).cast(DoubleType) / 100.0, 2))
  )

  /** A matched CONTAINER value seeds its template from the container's
    * canonical JSON form with NULL FIELDS DROPPED
    * (`canonical_json(to_json(·, ignoreNullFields))`), byte-identical to the
    * raw-JSON surface's seed ([[JsonDocs.mask]] renders the actual node with
    * null object entries dropped): both surfaces mask container PII to the
    * same value. Dropping nulls is what makes the parity hold on
    * HETEROGENEOUS containers — this column surface sees the schema UNION,
    * where a field absent from one document surfaces as null, while the raw
    * surface sees the document's actual keys. */
  private def piiSeed(c: Column, dt: DataType): Column = dt match {
    case _: StructType | _: ArrayType | _: MapType =>
      call_function("canonical_json",
        to_json(c, Map("ignoreNullFields" -> "true")))
    case _ => c
  }

  /** Rewrite one field: replace if the lowered name matches a PII kind
    * (containers replaced wholesale, sanitizer.py:51-55), recurse into
    * containers otherwise, pass scalars through. */
  private def maskField(name: String, c: Column, dt: DataType): Column =
    generators.get(name.toLowerCase) match {
      case Some(gen) => when(c.isNull, lit(null)).otherwise(gen(piiSeed(c, dt)))
      case None => dt match {
        case st: StructType =>
          val rewritten = struct(st.fields.toSeq.map(f =>
            maskField(f.name, c.getField(f.name), f.dataType).as(f.name)): _*)
          when(c.isNull, lit(null)).otherwise(rewritten)
        case ArrayType(et, _) =>
          transform(c, x => maskField(name, x, et))
        case MapType(_, vt, _) =>
          // map entries are (key → value): the KEY is the field name
          map_from_entries(transform(map_entries(c), e =>
            struct(e.getField("key").as("key"),
              maskStringKeyed(e.getField("key"), e.getField("value"), vt).as("value"))))
        case _ => c
      }
    }

  /** Map values are keyed by a RUNTIME string, so kind dispatch must happen
    * per row: a chained CASE over the (static, 31-entry) generator map.
    * Only string-valued maps get per-key masking — the CASE branches must
    * share one type, and every template renders as a string; non-string
    * value types are recursed as anonymous containers instead. */
  private def maskStringKeyed(key: Column, v: Column, vt: DataType): Column =
    vt match {
      case StringType =>
        val lowered = lower(key)
        generators.foldLeft(v) { case (acc, (kind, gen)) =>
          when(lowered === kind,
            when(v.isNull, lit(null)).otherwise(gen(v).cast(StringType)))
            .otherwise(acc)
        }
      case _ => maskField("", v, vt)
    }

  /** Mask a whole DataFrame, schema-driven, at every depth. Array elements
    * inherit their field's name (a list under a non-PII name is recursed,
    * matching sanitizer.py:58-61). */
  def apply(df: DataFrame): DataFrame = {
    // container-PII seeds resolve `canonical_json` by name at analysis
    GraftFunctions.register(df.sparkSession)
    df.select(df.schema.fields.toSeq.map(f =>
      maskField(f.name, col(f.name), f.dataType).as(f.name)): _*)
  }
}
