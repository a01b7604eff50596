package graft.schema

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sink.ConflictPolicy.{IgnoreAny, IgnoreOnConflict, UpdateOnConflict}
import graft.sink.WriteTolerance

/** The 13 collection→table specs, transcribed from the reference's
  * extraction modules and DDL (SURVEY.md §2.2/§2.4; per-table citations
  * below). `strict = true` (default) reproduces the reference's bugs
  * faithfully (T9 first-char referrers, T11 type←businessName); `strict =
  * false` applies the corrected mappings.
  */
object Specs {

  import Xform._

  private def st(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t) })

  private val S = StringType
  private val B = BooleanType
  private val I = IntegerType
  private val Dec = DecimalType(38, 10)
  private val D = DateType

  private def c(name: String, dt: DataType, expr: org.apache.spark.sql.Column) =
    TargetColumn(name, dt, expr)

  /** users — `dags/includes/user_table.py:25-121`. */
  def users: TableSpec = TableSpec(
    table = "users", collection = "users",
    source = st(
      "_id" -> Bson.oidType, "username" -> S,
      "personalInformation" -> st("firstName" -> S, "lastName" -> S,
        "email" -> S, "phoneNumber" -> S),
      "companyInformation" -> st("companyName" -> S),
      "roles" -> ArrayType(S),
      "deleted" -> B, "blocked" -> B, "hasPassword" -> B, "loggedIn" -> B,
      "accountReviewed" -> B,
      "validations" -> st("email" -> B, "phoneNumber" -> B),
      "dateCreated" -> Bson.dateType, "lastLogin" -> Bson.dateType),
    columns = Seq(
      c("_id", S, Bson.oid(col("_id"))),
      c("username", S, col("username")),
      c("first_name", S, col("personalInformation.firstName")),
      c("last_name", S, col("personalInformation.lastName")),
      c("email", S, col("personalInformation.email")),
      c("phone_number", S, col("personalInformation.phoneNumber")),
      c("company_name", S, col("companyInformation.companyName")),
      c("roles", S, json(col("roles"))),
      c("deleted", B, bool(col("deleted"))),
      c("blocked", B, bool(col("blocked"))),
      c("has_password", B, bool(col("hasPassword"))),
      c("logged_in", B, bool(col("loggedIn"))),
      c("account_reviewed", B, bool(col("accountReviewed"))),
      c("validation_email", B, bool(col("validations.email"))),
      c("validation_phone_number", B, bool(col("validations.phoneNumber"))),
      c("date_created", D, date(col("dateCreated"))),
      c("last_login", D, date(col("lastLogin")))),
    policy = UpdateOnConflict("_id", Seq("roles", "deleted", "blocked",
      "has_password", "logged_in", "account_reviewed", "validation_email",
      "validation_phone_number", "last_login")),
    // skip-bad-rows table: the reference wraps each users row in
    // `try/except: commit()` (user_table.py:116-121)
    tolerance = WriteTolerance.Permissive)

  /** organizations — `organizations_table.py:27-111`; T11 bug: `type` is
    * populated from `businessName` (`:65`); `businessAddress` projected but
    * dropped (T12, `:33`).
    */
  def organizations(strict: Boolean = true): TableSpec = TableSpec(
    table = "organizations", collection = "organizations",
    source = st(
      "_id" -> Bson.oidType, "businessName" -> S, "businessAddress" -> S,
      "registrationNumber" -> S, "type" -> S, "valueChain" -> S,
      "createdBy" -> S, "orgUser" -> S, "owner" -> S, "deleted" -> B,
      "dateCreated" -> Bson.dateType,
      "onboardingInformation" -> st("businessOperations" -> S,
        "businessLine" -> S, "businessType" -> S, "businessDateCreated" -> S,
        "businessOwner" -> S, "employeesAmount" -> S, "avenewsReason" -> S)),
    columns = Seq(
      c("_id", S, Bson.oid(col("_id"))),
      c("business_name", S, col("businessName")),
      c("registration_number", S, col("registrationNumber")),
      c("type", S, if (strict) col("businessName") else col("type")),
      c("value_chain", S, col("valueChain")),
      c("created_by", S, col("createdBy")),
      c("org_user", S, col("orgUser")),
      c("owner", S, col("owner")),
      c("deleted", B, bool(col("deleted"))),
      c("date_created", D, date(col("dateCreated"))),
      c("business_operations", S, col("onboardingInformation.businessOperations")),
      c("business_line", S, col("onboardingInformation.businessLine")),
      c("business_type", S, col("onboardingInformation.businessType")),
      c("business_date_created", S, col("onboardingInformation.businessDateCreated")),
      c("business_owner", S, col("onboardingInformation.businessOwner")),
      c("employees_amount", S, col("onboardingInformation.employeesAmount")),
      c("avenews_reason", S, col("onboardingInformation.avenewsReason"))),
    policy = UpdateOnConflict("_id", Seq("deleted")))

  private val productStruct = st("productId" -> S, "name" -> S,
    "packageSize" -> Dec, "measurementUnit" -> S, "unitPrice" -> Dec,
    "quantity" -> Dec)

  /** trades — `trades_table.py:32-121`; T8 head-of-products (`:69-74`). */
  def trades: TableSpec = TableSpec(
    table = "trades", collection = "trades",
    source = st(
      "_id" -> Bson.oidType, "type" -> S, "name" -> S,
      "products" -> ArrayType(productStruct),
      "totalPrice" -> Dec, "number" -> S, "organization" -> S,
      "createdBy" -> S, "notes" -> S, "status" -> S, "deleted" -> B,
      "date" -> Bson.dateType, "dueDate" -> Bson.dateType,
      "dateCreated" -> Bson.dateType),
    columns = Seq(
      c("_id", S, Bson.oid(col("_id"))),
      c("type", S, col("type")),
      c("name", S, col("name")),
      c("product_id", S, head(col("products"), "productId")),
      c("product_name", S, head(col("products"), "name")),
      c("package_size", Dec, head(col("products"), "packageSize")),
      c("measurement_unit", S, head(col("products"), "measurementUnit")),
      c("unit_price", Dec, head(col("products"), "unitPrice")),
      c("quantity", Dec, head(col("products"), "quantity")),
      c("total_price", Dec, col("totalPrice")),
      c("number", S, col("number")),
      // FK pair declared by the reference's trades DDL
      // (mongo_to_postgres_migration.py:61)
      c("organization", S, col("organization")).refs("organizations"),
      c("created_by", S, col("createdBy")).refs("users"),
      c("notes", S, col("notes")),
      c("status", S, col("status")),
      c("deleted", B, bool(col("deleted"))),
      c("date", D, date(col("date"))),
      c("due_date", D, date(col("dueDate"))),
      c("date_created", D, date(col("dateCreated")))),
    policy = UpdateOnConflict("_id", Seq("date", "status", "notes", "deleted")))

  /** agribusinesses — `agribusiness_table.py:32-109`; T9 first-char
    * referrers bug (`:63`), T10 empty-contacts defaults (`:73-78`).
    */
  def agribusinesses(strict: Boolean = true): TableSpec = TableSpec(
    table = "agribusinesses", collection = "agribusinesses",
    source = st(
      "_id" -> Bson.oidType, "organization" -> S,
      "businessDetails" -> st("name" -> S, "phoneNumber" -> S),
      "referrers" -> ArrayType(S),
      "contacts" -> ArrayType(st("_id" -> S, "firstName" -> S,
        "lastName" -> S, "deleted" -> B, "dateCreated" -> Bson.dateType)),
      "createdBy" -> S, "deleted" -> B, "dateCreated" -> Bson.dateType),
    columns = Seq(
      c("_id", S, Bson.oid(col("_id"))),
      c("organization", S, col("organization")),
      c("business_details_name", S, col("businessDetails.name")),
      c("business_details_phone", S, col("businessDetails.phoneNumber")),
      c("referrers", S,
        if (strict) firstCharOfStringified(col("referrers"))
        else try_element_at(col("referrers"), lit(1))),
      // FK per the reference's agribusinesses DDL
      // (mongo_to_postgres_migration.py:70)
      c("created_by", S, col("createdBy")).refs("users"),
      c("contact_deleted", B, headBool(col("contacts"), "deleted")),
      c("contact_first_name", S, head(col("contacts"), "firstName")),
      c("contact_last_name", S, head(col("contacts"), "lastName")),
      c("contact_id", S, head(col("contacts"), "_id")),
      c("contact_date_created", D, headDate(col("contacts"), "dateCreated")),
      c("deleted", B, bool(col("deleted"))),
      c("date_created", D, date(col("dateCreated")))),
    policy = UpdateOnConflict("_id",
      Seq("business_details_name", "contact_deleted", "deleted")))

  /** invoices — `invoices_table.py:31-131`; `tax` ← `taxPercentaje` typo
    * rename (T12, `:79`); `address`/`total` projected but dropped (`:38,45`);
    * `status` string-"False" default (`:100`).
    */
  def invoices: TableSpec = TableSpec(
    table = "invoices", collection = "invoices",
    source = st(
      "_id" -> Bson.oidType, "organization" -> S, "name" -> S,
      "address" -> S, "phoneNumber" -> S, "email" -> S,
      "paymentTerms" -> I, "paymentMethod" -> S, "termsAndConditions" -> S,
      "taxPercentaje" -> Dec, "total" -> Dec, "createdBy" -> S,
      "products" -> ArrayType(productStruct),
      "deleted" -> B, "status" -> S,
      "issueDate" -> Bson.dateType, "supplyDate" -> Bson.dateType,
      "dueDate" -> Bson.dateType, "dateCreated" -> Bson.dateType),
    columns = Seq(
      c("_id", S, Bson.oid(col("_id"))),
      c("organization", S, col("organization")),
      c("name", S, col("name")),
      c("phone_number", S, col("phoneNumber")),
      c("email", S, col("email")),
      c("payment_terms", I, col("paymentTerms")),
      c("payment_method", S, col("paymentMethod")),
      c("terms_and_conditions", S, col("termsAndConditions")),
      c("tax", Dec, col("taxPercentaje")),
      // FK per the reference's invoices DDL (mongo_to_postgres_migration
      // .py:79 — which cites `public.users`, unqualified here; see
      // TableSpec.ddl)
      c("created_by", S, col("createdBy")).refs("users"),
      c("product_id", S, head(col("products"), "productId")),
      c("product_name", S, head(col("products"), "name")),
      c("product_package_size", Dec, head(col("products"), "packageSize")),
      c("product_measurement_unit", S, head(col("products"), "measurementUnit")),
      c("product_unit_price", Dec, head(col("products"), "unitPrice")),
      c("product_quantity", Dec, head(col("products"), "quantity")),
      c("deleted", B, bool(col("deleted"))),
      c("status", S, strFalse(col("status"))),
      c("issue_date", D, date(col("issueDate"))),
      c("supply_date", D, date(col("supplyDate"))),
      c("due_date", D, date(col("dueDate"))),
      c("date_created", D, date(col("dateCreated")))),
    policy = UpdateOnConflict("_id", Seq("deleted", "status")))

  /** cashflow_events — `cashflow_events_table.py:25-96`; raw `products`
    * stringified (T7, `:64`).
    */
  def cashflowEvents: TableSpec = TableSpec(
    table = "cashflow_events", collection = "cashflowevents",
    source = st(
      "_id" -> Bson.oidType, "organization" -> S, "amount" -> Dec,
      "type" -> S, "createdBy" -> S,
      "products" -> ArrayType(st("name" -> S, "quantity" -> Dec)),
      "deleted" -> B, "status" -> S,
      "date" -> Bson.dateType, "dateCreated" -> Bson.dateType),
    columns = Seq(
      c("_id", S, Bson.oid(col("_id"))),
      c("organization", S, col("organization")),
      c("amount", Dec, col("amount")),
      c("type", S, col("type")),
      // FK per the reference's cashflow_events DDL
      // (mongo_to_postgres_migration.py:88)
      c("created_by", S, col("createdBy")).refs("users"),
      c("products", S, json(col("products"))),
      c("deleted", B, bool(col("deleted"))),
      c("status", S, strFalse(col("status"))),
      c("date", D, date(col("date"))),
      c("date_created", D, date(col("dateCreated")))),
    policy = UpdateOnConflict("_id", Seq("deleted", "status", "date")))

  /** cashflow_events_goals — `cashflow_events_goals_table.py:25-95`. */
  def cashflowEventsGoals: TableSpec = TableSpec(
    table = "cashflow_events_goals", collection = "cashfloweventgoals",
    source = st(
      "_id" -> Bson.oidType, "organization" -> S, "totalAmount" -> Dec,
      "monthAmount" -> Dec, "goal" -> S, "way" -> S,
      "notify" -> st("email" -> B), "createdBy" -> S,
      "deleted" -> B, "status" -> S,
      "date" -> Bson.dateType, "dateCreated" -> Bson.dateType),
    columns = Seq(
      c("_id", S, Bson.oid(col("_id"))),
      c("organization", S, col("organization")),
      c("total_amount", Dec, col("totalAmount")),
      c("month_amount", Dec, col("monthAmount")),
      c("goal", S, col("goal")),
      c("way", S, col("way")),
      c("notify", S, json(col("notify"))),
      // FK per the reference's cashflow_events_goals DDL
      // (mongo_to_postgres_migration.py:97)
      c("created_by", S, col("createdBy")).refs("users"),
      c("deleted", B, bool(col("deleted"))),
      c("status", S, strFalse(col("status"))),
      c("date", D, date(col("date"))),
      c("date_created", D, date(col("dateCreated")))),
    policy = UpdateOnConflict("_id", Seq("deleted", "status", "date")))

  /** accounts — `accounts_table.py:25-90`; `details` object stringified. */
  def accounts: TableSpec = TableSpec(
    table = "accounts", collection = "accounts",
    source = st(
      "_id" -> Bson.oidType, "beneficiaryId" -> S,
      "details" -> st("bank" -> S, "accountNumber" -> S),
      "service" -> S, "createdBy" -> S, "onModel" -> S,
      "deleted" -> B, "validated" -> B, "dateCreated" -> Bson.dateType),
    columns = Seq(
      c("_id", S, Bson.oid(col("_id"))),
      c("beneficiary_id", S, col("beneficiaryId")),
      c("details", S, json(col("details"))),
      c("service", S, col("service")),
      c("created_by", S, col("createdBy")),
      c("on_model", S, col("onModel")),
      c("deleted", B, bool(col("deleted"))),
      c("validated", B, bool(col("validated"))),
      c("date_created", D, date(col("dateCreated")))),
    policy = UpdateOnConflict("_id",
      Seq("details", "service", "on_model", "deleted", "validated")))

  /** loanoffers — `loanoffers_table.py:25-70` (camelCase kept, DO NOTHING). */
  def loanoffers: TableSpec = TableSpec(
    table = "loanoffers", collection = "loanoffers",
    source = st("_id" -> Bson.oidType, "financedAmount" -> Dec,
      "period" -> I, "minOffer" -> Dec, "optOffer" -> Dec),
    columns = Seq(
      c("_id", S, Bson.oid(col("_id"))),
      c("financedAmount", Dec, col("financedAmount")),
      c("period", I, col("period")),
      c("minOffer", Dec, col("minOffer")),
      c("optOffer", Dec, col("optOffer"))),
    policy = IgnoreOnConflict("_id"))

  /** loanproducts — `loanproducts_table.py:25-73`. */
  def loanproducts: TableSpec = TableSpec(
    table = "loanproducts", collection = "loanproducts",
    source = st("_id" -> Bson.oidType, "name" -> S, "productType" -> S,
      "type" -> S, "sellersType" -> S, "totalBuyingPrice" -> Dec),
    columns = Seq(
      c("_id", S, Bson.oid(col("_id"))),
      c("name", S, col("name")),
      c("productType", S, col("productType")),
      c("type", S, col("type")),
      c("sellersType", S, col("sellersType")),
      c("totalBuyingPrice", Dec, col("totalBuyingPrice"))),
    policy = IgnoreOnConflict("_id"))

  /** loanapplications — `loanapplication_table.py:25-100`: `$match` on
    * dateCreated (T2), `$unwind` products (Q1), conflict key = the unwound
    * `products` value (non-`_id` key,
    * `loan_applications_to_postgres_migration.py:52`).
    */
  def loanapplications: TableSpec = TableSpec(
    table = "loanapplications", collection = "loanapplications",
    source = st(
      "_id" -> Bson.oidType,
      "personalDetails" -> st("email" -> S, "primaryPhoneNumber" -> S),
      "businessDetails" -> st("name" -> S),
      "deleted" -> B, "dateCreated" -> Bson.dateType,
      "assignee" -> S, "status" -> S,
      "products" -> ArrayType(S), "dealId" -> S),
    columns = Seq(
      c("_id", S, Bson.oid(col("_id"))),
      c("deleted", B, bool(col("deleted"))),
      c("dateCreated", D, date(col("dateCreated"))),
      c("name", S, col("businessDetails.name")),
      c("email", S, col("personalDetails.email")),
      c("phoneNumber", S, col("personalDetails.primaryPhoneNumber")),
      c("status", S, col("status")),
      c("assignee", S, col("assignee")),
      c("products", S, col("products")),
      c("dealId", S, col("dealId"))),
    policy = UpdateOnConflict("products", Seq("deleted", "status")),
    filter = Some(Bson.ts(col("dateCreated")) >
      to_timestamp(lit("2022-10-05 00:00:00"))),
    unwind = Some("products"),
    // skip-bad-rows table (loanapplication_table.py:95-100)
    tolerance = WriteTolerance.Permissive)

  /** mlscore — `mlscore_table.py:25-75`. */
  def mlscore: TableSpec = TableSpec(
    table = "mlscore", collection = "mlscoredatas",
    source = st("_id" -> Bson.oidType, "loanId" -> S, "score" -> Dec,
      "categoriesTotalScore" -> Dec, "dateCreated" -> Bson.dateType),
    columns = Seq(
      c("_id", S, Bson.oid(col("_id"))),
      c("loanId", S, col("loanId")),
      c("score", Dec, col("score")),
      c("categoriesTotalScore", Dec, col("categoriesTotalScore")),
      c("dateCreated", D, date(col("dateCreated")))),
    policy = UpdateOnConflict("_id", Seq("score", "categoriesTotalScore")))

  /** loandeals — `loandeals_table.py:25-69` (bare ON CONFLICT DO NOTHING). */
  def loandeals: TableSpec = TableSpec(
    table = "loandeals", collection = "loandeals",
    source = st("_id" -> Bson.oidType, "minOffer" -> Dec,
      "totalBuying" -> Dec, "periodWeeks" -> I, "deleted" -> B),
    columns = Seq(
      c("_id", S, Bson.oid(col("_id"))),
      c("minOffer", Dec, col("minOffer")),
      c("totalBuying", Dec, col("totalBuying")),
      c("periodWeeks", I, col("periodWeeks")),
      c("deleted", B, bool(col("deleted")))),
    policy = IgnoreAny)

  /** All 13 specs in the reference's migration order. */
  def all(strict: Boolean = true): Seq[TableSpec] = Seq(
    users, organizations(strict), trades, agribusinesses(strict), invoices,
    cashflowEvents, cashflowEventsGoals, accounts,
    loanoffers, loanproducts, loanapplications, mlscore, loandeals)
}
