package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Normalize

/** The reference's entity projections, re-expressed as narrow selects so
  * Catalyst prunes the parquet scan down to exactly the referenced
  * columns (check `ReadSchema` in the explain output).
  *
  * The reference parses each BSON doc into a struct and routes it by
  * `Type` ("User" | "Organization", ght2dm.go:294-315), then projects
  * into `users` (3 cols, ght2dm.go:414-431), `gh_users` (14 cols,
  * ght2dm.go:375-411) and `gh_organizations` (10 cols,
  * ght2dm.go:340-372). The testdata stand-in routes `customer` rows by
  * market segment: BUILDING plays "Organization", everything else plays
  * "User".
  */
object Projections {

  /** Type dispatch (ght2dm.go:294-315): adds `entity_type`; rows that
    * match neither arm would be routed to a rejects side-output (the
    * reference logs-and-skips them — here the default arm is total). */
  def dispatch(customer: DataFrame): DataFrame =
    customer.withColumn("entity_type",
      when(col("c_mktsegment") === "BUILDING", lit("Organization"))
        .otherwise(lit("User")))

  /** `users` projection (ght2dm.go:414-431): (username, name, email). */
  def users(customer: DataFrame): DataFrame =
    dispatch(customer).filter(col("entity_type") === "User")
      .select(
        lower(col("c_name")).as("username"),
        col("c_name").as("name"),
        concat(replace(lower(col("c_name")), lit("#"), lit("_")),
          lit("@example.org")).as("email"))

  /** `gh_users` 14-col projection (ght2dm.go:375-411), with the
    * reference's `updated_at <- coalesce(updated_at, created_at)` fill
    * applied (ght2dm.go:386-389). Dates are synthesized deterministically
    * from the key since the stand-in table has no timestamps. */
  def ghUsers(customer: DataFrame): DataFrame = {
    val createdAt = date_add(to_date(lit("2014-01-01")),
      (col("c_custkey") % 365).cast("int"))
    // every 7th row has no updated_at -> falls back to created_at
    val updatedRaw = when(col("c_custkey") % 7 === 0, lit(null))
      .otherwise(date_add(to_date(lit("2015-01-01")),
        (col("c_custkey") % 365).cast("int")))
    dispatch(customer).filter(col("entity_type") === "User")
      .select(
        col("c_custkey").as("user_id"),
        (col("c_custkey") + 1000000L).as("github_id"),
        lower(col("c_name")).as("login"),
        col("c_mktsegment").as("bio"),
        lit("n/a").as("company"),
        concat(lower(col("c_name")), lit("@example.org")).as("email"),
        (col("c_acctbal") > 0).as("hireable"),
        col("c_nationkey").cast("int").as("location_id"),
        concat(lit("https://avatars.example/u/"), col("c_custkey")).as("avatar_url"),
        concat(lit("https://github.example/"), lower(col("c_name"))).as("html_url"),
        (col("c_custkey") % 5000).cast("bigint").as("followers_count"),
        (col("c_custkey") % 500).cast("bigint").as("following_count"),
        createdAt.as("created_at"),
        Normalize.coalesceUpdated(updatedRaw, createdAt).as("updated_at"))
  }

  /** `gh_organizations` 10-col projection (ght2dm.go:340-372). */
  def ghOrganizations(customer: DataFrame): DataFrame = {
    val createdAt = date_add(to_date(lit("2014-01-01")),
      (col("c_custkey") % 365).cast("int"))
    dispatch(customer).filter(col("entity_type") === "Organization")
      .select(
        lower(col("c_name")).as("login"),
        (col("c_custkey") + 2000000L).as("github_id"),
        concat(lit("https://avatars.example/o/"), col("c_custkey")).as("avatar_url"),
        concat(lit("https://github.example/o/"), lower(col("c_name"))).as("html_url"),
        col("c_name").as("name"),
        lit("n/a").as("company"),
        col("c_nationkey").cast("int").as("location_id"),
        concat(lower(col("c_name")), lit("@example.org")).as("email"),
        createdAt.as("created_at"),
        createdAt.as("updated_at"))
  }
}
