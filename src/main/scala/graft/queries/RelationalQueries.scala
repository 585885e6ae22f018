package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.serving.ServingLayer
import graft.silver.Dimensions
import TestdataAdapter._

/** SURVEY.md §2.2 (row-level transforms) + §2.3 (relational operators)
  * re-expressed over the testdata schema, each with its DuckDB oracle.
  */
object RelationalQueries {

  val defs: Seq[QueryDef] = Seq(

    // R1 — distinct
    QueryDef("r01_distinct",
      (s, dir) => Tables.lineitem(s, dir)
        .select("l_returnflag", "l_linestatus").distinct(),
      Some("SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem")),

    // R2 — anti-join: parts with no shipment since 2001-06-01 (the
    // build side is filtered so the result is NON-empty at every sf —
    // an unfiltered "never shipped" matches zero parts and would pass
    // vacuously).
    QueryDef("r02_anti_join",
      (s, dir) => {
        val part = Tables.part(s, dir)
        val li = Tables.lineitem(s, dir)
          .where(col("l_shipdate") >= lit("2001-06-01"))
          .select(col("l_partkey"))
        part.join(li, part("p_partkey") === li("l_partkey"), "left_anti")
          .select("p_partkey", "p_name")
      },
      Some("""SELECT p_partkey, p_name FROM part
             |WHERE NOT EXISTS (SELECT 1 FROM lineitem
             |                  WHERE l_partkey = p_partkey
             |                    AND l_shipdate >= DATE '2001-06-01')""".stripMargin)),

    // R2 extended variant — enrichment candidates: ids missing from
    // dims OR present with NULL name (retry semantics), via the real
    // Dimensions.missingItemIds (reference postgres_client.py:68-81).
    QueryDef("r02b_enrichment_candidates",
      (s, dir) => {
        val dimsWithHoles = dimsFromPart(s, dir).withColumn("name",
          when(col("item_id") % 7 === 0, lit(null)).otherwise(col("name")))
        Dimensions.missingItemIds(silverFromLineitem(s, dir), dimsWithHoles, limit = 100)
      },
      Some(s"""WITH $silverSql, $dimsSql,
              |dims2 AS (SELECT item_id,
              |                 CASE WHEN item_id % 7 = 0 THEN NULL ELSE name END AS name
              |          FROM dims)
              |SELECT f.item_id
              |FROM (SELECT DISTINCT item_id FROM silver WHERE item_id IS NOT NULL) f
              |LEFT JOIN dims2 d ON f.item_id = d.item_id
              |WHERE d.item_id IS NULL OR d.name IS NULL
              |ORDER BY f.item_id LIMIT 100""".stripMargin)),

    // R3/R6 — top-k: sort desc + limit
    QueryDef("r03_top_k",
      (s, dir) => Tables.orders(s, dir)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)),

    // R4 — offset pagination (stable: ordered by key)
    QueryDef("r04_pagination",
      (s, dir) => Tables.customer(s, dir)
        .orderBy(col("c_custkey"))
        .select("c_custkey", "c_name", "c_acctbal")
        .offset(20).limit(10),
      Some("""SELECT c_custkey, c_name, c_acctbal FROM customer
             |ORDER BY c_custkey LIMIT 10 OFFSET 20""".stripMargin)),

    // R5 — equality filter + aggregate. The money sum goes through
    // DECIMAL: sum(DOUBLE) accumulates in engine/partition-specific
    // order, and a few-ulp difference at 1e10 magnitude flips the
    // 6th decimal the oracle hash rounds to; decimal summation is
    // exact (and the right type for money anyway).
    QueryDef("r05_filter_agg",
      (s, dir) => Tables.orders(s, dir)
        .where(col("o_orderstatus") === lit("F"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)"))
            .cast("double").as("total")), // exact decimal sum, then ONE
      // cast — type-stable across engines (decimal sum precisions differ)
      Some("""SELECT o_orderpriority, count(*) AS n,
             |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM orders WHERE o_orderstatus = 'F' GROUP BY o_orderpriority""".stripMargin)),

    // R7 — argmin (cheapest order; full tiebreak)
    QueryDef("r07_argmin",
      (s, dir) => Tables.orders(s, dir)
        .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
        .select("o_orderkey", "o_totalprice")
        .limit(1),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice ASC, o_orderkey LIMIT 1""".stripMargin)),

    // R8 — count by group
    QueryDef("r08_count",
      (s, dir) => Tables.events(s, dir)
        .groupBy("event_type").agg(count(lit(1)).as("n")),
      Some("SELECT event_type, count(*) AS n FROM events GROUP BY event_type")),

    // R9/S4/S7 — retention predicate: keep last 7 days relative to the
    // data's own max date (partition pruning at scale).
    QueryDef("r09_retention",
      (s, dir) => {
        val e = Tables.events(s, dir).withColumn("d", col("ts").cast("date"))
        val mx = e.agg(max(col("d")).as("mx"))
        e.crossJoin(broadcast(mx))
          .where(col("d") >= date_sub(col("mx"), 7))
          .groupBy("d").agg(count(lit(1)).as("n"))
      },
      Some("""SELECT CAST(ts AS DATE) AS d, count(*) AS n FROM events
             |WHERE CAST(ts AS DATE) >=
             |      (SELECT max(CAST(ts AS DATE)) FROM events) - 7
             |GROUP BY CAST(ts AS DATE)""".stripMargin)),

    // T1 — array explode -> table (document -> rows)
    QueryDef("t01_explode",
      (s, dir) => Tables.part(s, dir)
        .select(explode(split(col("p_name"), " ")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("n")),
      Some("""SELECT word, count(*) AS n
             |FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
             |GROUP BY word""".stripMargin)),

    // T3/T5 — nested JSON field extraction + lenient (coerce-to-null)
    // cast, the silver normalization semantics (transformation.py:49-51)
    QueryDef("t05_lenient_cast",
      (s, dir) => Tables.events(s, dir).select(
        col("event_id"),
        from_json(col("props"), lit("k INT")).getField("k").as("k"),
        col("event_type").cast("int").as("as_num")),
      Some("""SELECT event_id,
             |       CAST(nullif(regexp_extract(props, '"k":\s*(\d+)', 1), '') AS INT) AS k,
             |       TRY_CAST(event_type AS INT) AS as_num
             |FROM events""".stripMargin)),

    // T6/T7 — null-default fill + coalesce-division derived column
    // (unit price semantics, truncating to BIGINT for sink parity)
    QueryDef("t07_derived_unit_price",
      (s, dir) => Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        coalesce(col("l_quantity"), lit(1.0)).as("qty_filled"),
        floor(col("l_extendedprice") /
          when(col("l_quantity") === 0.0, lit(null)).otherwise(col("l_quantity")))
          .cast("long").as("unit_price")),
      Some("""SELECT l_orderkey, l_linenumber, l_partkey,
             |       COALESCE(l_quantity, 1.0) AS qty_filled,
             |       CAST(FLOOR(l_extendedprice / nullif(l_quantity, 0.0)) AS BIGINT)
             |         AS unit_price
             |FROM lineitem""".stripMargin)),

    // T12 — copper -> gold currency display string
    QueryDef("t12_currency_format",
      (s, dir) => {
        val mx = silverFromLineitem(s, dir)
          .groupBy("item_id").agg(max(col("unit_price")).as("mx"))
        mx.select(col("item_id"),
          ServingLayer.copperToGold(col("mx")).as("display_price"))
      },
      Some(s"""WITH $silverSql,
              |mx AS (SELECT item_id, max(unit_price) AS mx FROM silver GROUP BY item_id)
              |SELECT item_id,
              |       replace(format('{:,}', CAST(FLOOR(mx / 10000.0) AS BIGINT)), ',', '.')
              |         || 'g' AS display_price
              |FROM mx""".stripMargin)),

    // S5/§1.4 — first-seen-wins dedup re-expressed as a window:
    // earliest row per (user, event_type) by arrival order
    QueryDef("s05_first_seen_dedup",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("event_id"))
        Tables.events(s, dir)
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select(col("user_id"), col("event_type"),
            col("ts").cast("date").as("first_date"), col("value"))
      },
      Some("""SELECT user_id, event_type, CAST(ts AS DATE) AS first_date, value
             |FROM (SELECT *, row_number() OVER (
             |        PARTITION BY user_id, event_type ORDER BY event_id) AS rn
             |      FROM events)
             |WHERE rn = 1""".stripMargin)),

    // R10 — CDC latest-wins apply: the event stream read as a change
    // log (errors tombstone the user), collapsed to current state.
    // One key-grain shuffle, no join; oracle re-derives the rank in
    // SQL.
    QueryDef("r10_cdc_apply",
      (s, dir) => {
        val changelog = Tables.events(s, dir).select(
          col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          col("event_id"),
          when(col("event_type") === "error", "D").otherwise("U").as("op"),
          col("event_type"),
          round(col("value") * 100).cast("long").as("cents"))
        graft.silver.Cdc.apply(changelog, keyCol = "user_id",
          tsCol = "ts_us", tieCol = "event_id", opCol = "op",
          attrs = Seq("event_type", "cents"))
      },
      Some("""WITH e AS (SELECT user_id,
             |                 epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
             |                 event_id,
             |                 CASE WHEN event_type = 'error' THEN 'D'
             |                      ELSE 'U' END AS op,
             |                 event_type,
             |                 CAST(round(value * 100, 0) AS BIGINT) AS cents
             |          FROM events),
             |r AS (SELECT *, row_number() OVER (
             |        PARTITION BY user_id
             |        ORDER BY ts_us DESC, event_id DESC) AS rn
             |      FROM e)
             |SELECT user_id, event_type, cents,
             |       ts_us AS applied_ts, event_id AS applied_tie
             |FROM r WHERE rn = 1 AND op <> 'D'""".stripMargin))
  )
}
