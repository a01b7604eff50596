package graft

import java.sql.Date

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.ExtendedJson
import graft.schema.Specs

/** T3–T12 flatten/default semantics per table spec, against extended-JSON
  * fixtures shaped per FIXTURES.md (incl. the minimal-document and
  * empty-array adversarial cases). Oracle: the reference's per-table
  * extraction loops (e.g. `/root/reference/dags/includes/user_table.py:56-87`).
  */
class TableSpecSpec extends AnyFunSuite {
  import TestSpark.spark

  private val sentinel = Date.valueOf("1990-01-01")

  private def row(spec: graft.schema.TableSpec, lines: String*): Seq[Row] =
    spec.transform(ExtendedJson.fromLines(spark, spec.source, lines)).collect().toSeq

  test("users: full document flattens with renames; nested T3 paths land") {
    val Seq(r) = row(Specs.users,
      """{"_id": {"$oid": "63e1f0a1b2c3d4e5f6a7b8c9"}, "username": "jadoe",
        | "personalInformation": {"firstName": "Jane", "lastName": "Doe",
        |   "email": "jane@example.com", "phoneNumber": "+254700000001"},
        | "companyInformation": {"companyName": "Doe Farms"},
        | "roles": ["admin", "trader"],
        | "deleted": false, "blocked": false, "hasPassword": true, "loggedIn": true,
        | "accountReviewed": false,
        | "validations": {"email": true, "phoneNumber": false},
        | "dateCreated": {"$date": "2022-11-02T08:15:30Z"},
        | "lastLogin": {"$date": "2023-01-15T12:00:00Z"}}""".stripMargin.replace("\n", " "))
    assert(r.getAs[String]("_id") == "63e1f0a1b2c3d4e5f6a7b8c9")
    assert(r.getAs[String]("first_name") == "Jane")
    assert(r.getAs[String]("company_name") == "Doe Farms")
    assert(r.getAs[String]("roles") == """["admin","trader"]""")
    assert(r.getAs[Boolean]("has_password"))
    assert(r.getAs[Boolean]("validation_email"))
    assert(!r.getAs[Boolean]("validation_phone_number"))
    assert(r.getAs[Date]("date_created") == Date.valueOf("2022-11-02"))
    assert(r.getAs[Date]("last_login") == Date.valueOf("2023-01-15"))
  }

  test("users: minimal {_id} document takes every T4 default") {
    val Seq(r) = row(Specs.users, """{"_id": {"$oid": "63e1f0a1b2c3d4e5f6a7b8ca"}}""")
    assert(r.getAs[String]("_id") == "63e1f0a1b2c3d4e5f6a7b8ca")
    assert(r.getAs[String]("username") == null)
    assert(r.getAs[String]("first_name") == null) // absent nested struct
    assert(r.getAs[String]("roles") == null)
    Seq("deleted", "blocked", "has_password", "logged_in", "account_reviewed",
      "validation_email", "validation_phone_number")
      .foreach(c => assert(!r.getAs[Boolean](c), c))
    assert(r.getAs[Date]("date_created") == sentinel)
    assert(r.getAs[Date]("last_login") == sentinel)
  }

  test("organizations: T11 bug-compat type<-businessName, corrected behind flag") {
    val doc =
      """{"_id": {"$oid": "63e1f1a10000000000000001"}, "businessName": "Green Valley",
        | "type": "supplier", "businessAddress": "dropped",
        | "onboardingInformation": {"businessLine": "grain"}}""".stripMargin.replace("\n", " ")
    val Seq(strict) = row(Specs.organizations(strict = true), doc)
    assert(strict.getAs[String]("type") == "Green Valley")
    assert(strict.getAs[String]("business_line") == "grain")
    assert(!strict.schema.fieldNames.contains("business_address")) // T12 dropped
    val Seq(fixed) = row(Specs.organizations(strict = false), doc)
    assert(fixed.getAs[String]("type") == "supplier")
  }

  test("trades: T8 head-of-products extraction with defaults on empty array") {
    val full =
      """{"_id": {"$oid": "63e1f2a10000000000000001"}, "type": "sale",
        | "products": [{"productId": "p-1", "name": "Maize", "packageSize": 90,
        |   "measurementUnit": "kg", "unitPrice": 45.5, "quantity": 200},
        |  {"productId": "p-2", "name": "Beans"}],
        | "totalPrice": 9100.0, "status": "open",
        | "date": {"$date": "2023-01-10T00:00:00Z"}}""".stripMargin.replace("\n", " ")
    val empty = """{"_id": {"$oid": "63e1f2a10000000000000002"}, "products": []}"""
    val rows = row(Specs.trades, full, empty).sortBy(_.getAs[String]("_id"))
    val (r1, r2) = (rows(0), rows(1))
    assert(r1.getAs[String]("product_id") == "p-1") // head only, p-2 ignored
    assert(r1.getAs[String]("product_name") == "Maize")
    assert(r1.getAs[java.math.BigDecimal]("unit_price").doubleValue() == 45.5)
    assert(r1.getAs[Date]("date") == Date.valueOf("2023-01-10"))
    assert(r1.getAs[Date]("due_date") == sentinel)
    assert(r2.getAs[String]("product_id") == null)
    assert(r2.getAs[java.math.BigDecimal]("quantity") == null)
  }

  test("agribusinesses: T9 first-char referrers, T10 empty-contacts defaults") {
    val withAll =
      """{"_id": {"$oid": "63e1f3a10000000000000001"},
        | "businessDetails": {"name": "AgriCo", "phoneNumber": "+254711111111"},
        | "referrers": ["63e1f0a1b2c3d4e5f6a7b8c9"],
        | "contacts": [{"_id": "c-1", "firstName": "Sam", "lastName": "K",
        |   "deleted": false, "dateCreated": {"$date": "2022-10-01T00:00:00Z"}}]
        |}""".stripMargin.replace("\n", " ")
    val emptyArrays =
      """{"_id": {"$oid": "63e1f3a10000000000000002"}, "contacts": [], "referrers": []}"""
    val rows = row(Specs.agribusinesses(), withAll, emptyArrays)
      .sortBy(_.getAs[String]("_id"))
    val (r1, r2) = (rows(0), rows(1))
    assert(r1.getAs[String]("referrers") == "[") // the reference's str(list)[0]
    assert(r1.getAs[String]("contact_first_name") == "Sam")
    assert(r1.getAs[Date]("contact_date_created") == Date.valueOf("2022-10-01"))
    assert(!r1.getAs[Boolean]("contact_deleted"))
    // empty contacts -> the explicit else-branch defaults (T10)
    assert(r2.getAs[String]("referrers") == "[")
    assert(r2.getAs[String]("contact_first_name") == null)
    assert(!r2.getAs[Boolean]("contact_deleted"))
    assert(r2.getAs[Date]("contact_date_created") == sentinel)
    // corrected mode: first referrer element, null when empty
    val fixed = row(Specs.agribusinesses(strict = false), withAll, emptyArrays)
      .sortBy(_.getAs[String]("_id"))
    assert(fixed(0).getAs[String]("referrers") == "63e1f0a1b2c3d4e5f6a7b8c9")
    assert(fixed(1).getAs[String]("referrers") == null)
  }

  test("invoices: tax<-taxPercentaje typo rename; status string-False default") {
    val Seq(r) = row(Specs.invoices,
      """{"_id": {"$oid": "63e1f4a10000000000000001"}, "taxPercentaje": 16,
        | "total": 10556.0, "address": "dropped"}""".stripMargin.replace("\n", " "))
    assert(r.getAs[java.math.BigDecimal]("tax").intValue() == 16)
    assert(r.getAs[String]("status") == "False")
    assert(!r.schema.fieldNames.contains("total")) // T12 dropped
  }

  test("loanapplications: T2 date filter + Q1 unwind + per-product rows") {
    val recent =
      """{"_id": {"$oid": "63e1faa10000000000000001"},
        | "personalDetails": {"email": "app@example.com"},
        | "businessDetails": {"name": "Green Valley"},
        | "dateCreated": {"$date": "2022-12-15T00:00:00Z"}, "status": "review",
        | "products": ["prod-a", "prod-b"]}""".stripMargin.replace("\n", " ")
    val old = // must be filtered out by the 2022-10-05 $match
      """{"_id": {"$oid": "63e1faa10000000000000002"},
        | "dateCreated": {"$date": "2022-09-01T00:00:00Z"},
        | "products": ["p-old"]}""".stripMargin.replace("\n", " ")
    val noProducts = // $unwind drops empty/missing arrays
      """{"_id": {"$oid": "63e1faa10000000000000003"},
        | "dateCreated": {"$date": "2022-12-20T00:00:00Z"}, "products": []}"""
        .stripMargin.replace("\n", " ")
    val rows = row(Specs.loanapplications, recent, old, noProducts)
    assert(rows.length == 2)
    assert(rows.map(_.getAs[String]("products")).sorted == Seq("prod-a", "prod-b"))
    assert(rows.forall(_.getAs[String]("_id") == "63e1faa10000000000000001"))
    assert(rows.forall(_.getAs[String]("email") == "app@example.com"))
  }

  test("cashflow_events: T7 raw products array stringified to JSON") {
    val Seq(r) = row(Specs.cashflowEvents,
      """{"_id": {"$oid": "63e1f5a10000000000000001"},
        | "products": [{"name": "Maize", "quantity": 10}], "amount": 5000.0
        |}""".stripMargin.replace("\n", " "))
    assert(r.getAs[String]("products") == """[{"name":"Maize","quantity":10.0000000000}]""")
    assert(r.getAs[String]("status") == "False")
  }

  test("every spec: minimal {_id}-only document transforms without error") {
    for (spec <- Specs.all() if spec.unwind.isEmpty) {
      val out = spec.transform(ExtendedJson.fromLines(spark, spec.source,
        Seq("""{"_id": {"$oid": "000000000000000000000000"}}""")))
      assert(out.count() == 1, spec.table)
      assert(out.columns.toSeq == spec.columns.map(_.name), spec.table)
    }
  }

  test("ddl renders both dialects with key constraints") {
    val pg = Specs.users.ddl()
    assert(pg.contains("CREATE TABLE IF NOT EXISTS \"users\""))
    assert(pg.contains("\"id\" bigint PRIMARY KEY"))
    assert(pg.contains("UNIQUE (\"_id\")"))
    val derby = Specs.loandeals.ddl(graft.schema.TableSpec.derbyType, ifNotExists = false)
    assert(!derby.contains("IF NOT EXISTS"))
    assert(!derby.contains("UNIQUE")) // bare IgnoreAny declares no key
    assert(derby.contains("DECIMAL(31,10)"))
  }

  test("ddl emits the reference's foreign-key clauses (Postgres form)") {
    // mongo_to_postgres_migration.py:61-97 — five tables declare
    // REFERENCES into users/organizations on (_id)
    val trades = Specs.trades.ddl()
    assert(trades.contains(
      "\"organization\" varchar REFERENCES \"organizations\" (\"_id\")"))
    assert(trades.contains(
      "\"created_by\" varchar REFERENCES \"users\" (\"_id\")"))
    for (spec <- Seq(Specs.agribusinesses(), Specs.invoices,
        Specs.cashflowEvents, Specs.cashflowEventsGoals))
      assert(spec.ddl().contains(
        "\"created_by\" varchar REFERENCES \"users\" (\"_id\")"), spec.table)
    // tables the reference declares no FKs on stay clean
    assert(!Specs.users.ddl().contains("REFERENCES"))
    assert(!Specs.accounts.ddl().contains("REFERENCES"))
    // and the Derby/test form omits them entirely
    assert(!Specs.trades.ddl(graft.schema.TableSpec.derbyType,
      ifNotExists = false, foreignKeys = false).contains("REFERENCES"))
  }
}
