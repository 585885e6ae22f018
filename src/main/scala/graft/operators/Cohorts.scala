package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention — the classic product-analytics matrix: users
  * grouped by their first-active day (the cohort), each cohort
  * tracked over day offsets ("of the users who arrived on D, how
  * many were active on D+7?"). The warehouse twin of the funnel: the
  * funnel follows ordered steps inside a window, retention follows
  * RETURN activity over calendar offsets.
  *
  * Scale shape: activity collapses to the (user, day) DISTINCT grain
  * in the first aggregation (map-side combinable — the raw event
  * volume never shuffles twice), cohorts are a user-grain min, and
  * the matrix is a (cohort, offset)-grain count. `countDistinct` in
  * the final agg is exact and safe: its grain is users-per-cell,
  * already deduplicated to one row per (user, day) upstream.
  * Retention is ONE exact integer division per cell.
  */
object Cohorts {

  def retention(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val days = events
      .select(col(userCol).as("user"), to_date(col(tsCol)).as("day"))
      .where(col("user").isNotNull && col("day").isNotNull)
      .distinct()
    val cohorts = days.groupBy(col("user"))
      .agg(min(col("day")).as("cohort_day"))
    val cells = days.join(cohorts, Seq("user"))
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("day_offset"))
      .agg(count_distinct(col("user")).as("n_active"))
    val sizes = cells.where(col("day_offset") === 0)
      .select(col("cohort_day"), col("n_active").as("n_cohort"))
    cells.join(sizes, Seq("cohort_day"))
      .select(col("cohort_day"), col("day_offset"),
        col("n_active"), col("n_cohort"),
        (col("n_active") / col("n_cohort")).as("retention"))
  }
}
