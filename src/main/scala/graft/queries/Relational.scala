package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dset.DSet

/** Relational query pack over the driver testdata (TESTDATA.md).
  *
  * Demonstrates the reference's operator algebra (SURVEY §2) answering real
  * queries on the TPC-H-ish star schema, plus the Spark-native bonuses the
  * reference lacks (windows, rollup, set ops, top-k — SURVEY §2.7). Every
  * query has a DuckDB oracle in [[oracles]]; column aliases match exactly
  * on both sides (driver hash-compares after sorting columns by name).
  *
  * Floating-point policy: aggregates computed from arithmetic are rounded
  * to 2 decimals on BOTH sides so summation-order differences between
  * engines can't flip the hash; raw stored doubles are emitted unrounded.
  */
object Relational {

  private def round2(v: Double): Double =
    BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 shape: scan → filter → hash agg (partial + final; one shuffle
    // on the 6-ish group keys). Reference pipeline: filter+map+fold
    // (SURVEY §7 step 2).
    "q1_pricing_summary" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 2).as("avg_qty"),
          round(avg(col("l_discount")), 2).as("avg_disc"),
          count(lit(1)).as("count_order"))
    },

    // Selective filter + narrow projection — predicate/column pushdown to
    // the parquet scan (reference `filter`+`map`, DG:1006/1029).
    "q2_selective_filter" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_quantity") >= 49 && col("l_shipdate") >= lit("2000-01-01"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_discount"))
    },

    // 3-way join + agg (customer ⋈ orders ⋈ lineitem): the big fact-fact
    // join shuffles on the key; the customer dim is broadcast by Catalyst.
    "q3_revenue_by_segment" -> { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
      val l = Tables.load(s, dir, "lineitem")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .filter(o("o_orderdate") >= lit("1997-01-01"))
        .groupBy(col("c_mktsegment"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
    },

    // EXISTS → left-semi join (free in Spark, absent in the reference —
    // SURVEY §2.4 "no semi/anti joins").
    "q4_priority_exists" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      val l = Tables.load(s, dir, "lineitem").filter(col("l_quantity") > 45)
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    },

    // TPC-H Q5 shape: 6-way join; dims (region/nation/supplier/customer)
    // broadcast, fact-fact shuffle on orderkey only.
    "q5_nation_revenue" -> { (s, dir) =>
      val r = Tables.load(s, dir, "region")
      val n = Tables.load(s, dir, "nation")
      val c = Tables.load(s, dir, "customer")
      val sup = Tables.load(s, dir, "supplier")
      val o = Tables.load(s, dir, "orders")
      val l = Tables.load(s, dir, "lineitem")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey") && c("c_nationkey") === sup("s_nationkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .filter(o("o_orderdate") >= lit("1996-01-01") && o("o_orderdate") < lit("1998-01-01"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
    },

    // TPC-H Q6 shape: fully-pushed-down selective scan + scalar agg.
    "q6_forecast_revenue" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(
          col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01") &&
            col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))
    },

    // Window function (rank per partition) — Spark-native bonus
    // (SURVEY §2.7: reference has none). Deterministic tiebreak on the
    // stored key so both engines agree.
    "q7_top_orders_per_cust" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.load(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
    },

    // Analytic-window pack: lag / lead / ntile / running sum share ONE
    // window spec, so Catalyst plans a single shuffle on o_custkey and
    // one sort — four analytics for the price of one exchange.
    "ql1_window_analytics" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      Tables.load(s, dir, "orders")
        .withColumn("prev_price", round(lag(col("o_totalprice"), 1).over(w), 2))
        .withColumn("next_price", round(lead(col("o_totalprice"), 1).over(w), 2))
        .withColumn("quartile", ntile(4).over(w).cast("long"))
        .withColumn("running_spend",
          round(sum(col("o_totalprice"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
        .select(col("o_custkey"), col("o_orderkey"), col("prev_price"),
          col("next_price"), col("quartile"), col("running_spend"))
    },

    // LOCF forward-fill (gap repair): clicks report no value — the
    // gauge-on-change pattern — and every gap takes the user's most
    // recent observation in (ts, event_id) order; rows before the first
    // observation stay null. One window pass (the ql1 sort class).
    "ql2_locf_fill" -> { (s, dir) =>
      import graft.operators.Timeseries
      val gappy = Tables.load(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
          when(col("event_type") === "click", lit(null)).otherwise(col("value")).as("v"))
      Timeseries.locf(gappy, "v", Seq("user_id"), Seq("ts", "event_id"), "v_filled")
        .select(col("event_id"), col("user_id"), col("v_filled"),
          Timeseries.carriedMarker("v").as("carried"))
    },

    // Rollup (grouping sets) — Spark-native bonus.
    "q8_rollup_status_priority" -> { (s, dir) =>
      Tables.load(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("sum_price"))
    },

    // distinct — absent in the reference (SURVEY §2.7 set ops).
    "q9_distinct_flags" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus")).distinct()
    },

    // INTERSECT / EXCEPT — absent in the reference.
    "q10_nations_intersect" -> { (s, dir) =>
      val c = Tables.load(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      val sup = Tables.load(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
      c.intersect(sup)
    },
    "q11_quantities_except" -> { (s, dir) =>
      val l = Tables.load(s, dir, "lineitem")
      l.select(col("l_quantity").as("qty"))
        .except(l.filter(col("l_quantity") > 10).select(col("l_quantity").as("qty")))
    },

    // Top-k: Catalyst plans TakeOrderedAndProject (no global sort) —
    // the reference has no limit/top-k operator (SURVEY §2.7).
    "q12_topk_orders" -> { (s, dir) =>
      Tables.load(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    },

    // TPC-H Q13 shape: outer join + two-level aggregation.
    "q13_orders_per_customer" -> { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    },

    // Theta cross join (reference `crossJoinChoose`, DG:1670-1693).
    "q14_theta_crossjoin" -> { (s, dir) =>
      val r = Tables.load(s, dir, "region")
      val n = Tables.load(s, dir, "nation")
      r.crossJoin(n)
        .filter(col("r_regionkey") =!= col("n_regionkey"))
        .select(col("r_name"), col("n_name"))
    },

    // Time-bucketed aggregation over the event stream table (batch analog
    // of the reference's telemetry cycle, paper §6.2).
    "q15_events_hourly" -> { (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
    },

    // JSON extraction from the event props column.
    "q16_events_json" -> { (s, dir) =>
      Tables.load(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy(col("event_type"))
        .agg(round(avg(col("k")), 2).as("avg_k"), count(lit(1)).as("n"))
    },

    // Wordcount, DataFrame-style (reference flagship sample,
    // `samples/examples/FSharpExamples/WordCount.fs:33-68`).
    "q17_wordcount" -> { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy(col("word"))
        .agg(count(lit(1)).as("cnt"))
    },

    // fold action through the typed DSet facade (reference
    // `DSetGenerics.fs:392-433`; SURVEY §2.6).
    "q18_fold_total_qty" -> { (s, dir) =>
      import s.implicits._
      val qty = new DSet(Tables.load(s, dir, "lineitem").select(col("l_quantity")).as[Double])
      val total = qty.fold(0.0)(_ + _, _ + _)
      Seq(round2(total)).toDF("total_qty")
    },

    // mapReduce composite through the typed DSet facade (reference
    // `DSetGenerics.fs:1396-1465`) — associative counting, so it takes the
    // combiner path: map-side pre-aggregation means one partial count per
    // (partition, word) crosses the shuffle, not one pair per occurrence.
    "q19_mapreduce_wordcount" -> { (s, dir) =>
      import s.implicits._
      val docs = new DSet(Tables.load(s, dir, "documents").select(col("text")).as[String])
      docs
        .mapReduceAssoc(t => t.split(" ").iterator.filter(_.nonEmpty).map(w => (w, 1L)))(_ + _)
        .ds.toDF("word", "cnt")
    },

    // Custom typed Aggregator (the Spark UDAF surface for the reference's
    // fold-style aggregation; SURVEY §2.7 "fold = UDAF").
    "qagg_variance" -> { (s, dir) =>
      import s.implicits._
      val varCol = new graft.functions.Aggregators.VarianceAgg().toColumn
      Tables.load(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_quantity")).as[(String, Double)]
        .groupByKey(_._1).mapValues(_._2)
        .agg(varCol)
        .toDF("l_returnflag", "var_raw")
        .select(col("l_returnflag"), round(col("var_raw"), 2).as("var_qty"))
    },

    // Top-k per key via a bounded-heap aggregate — same semantics as
    // q7's window form, but with partial aggregation instead of a
    // per-partition full sort (the scalable form). r20: the heap is
    // Catalyst's own CollectTopK (graftbridge.collectTopK) — identical
    // (price DESC, orderkey ASC) keying, no typed-encoder round trip.
    "qtopk_per_cust_agg" -> { (s, dir) =>
      Tables.load(s, dir, "orders")
        .select(col("o_custkey"), col("o_totalprice"), col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(org.apache.spark.sql.graftbridge.collectTopK(
          struct((-col("o_totalprice")).as("_1"), col("o_orderkey").as("_2"),
            col("o_totalprice").as("_3")), 2).as("top"))
        .select(col("o_custkey"), posexplode(col("top")))
        .select(
          col("o_custkey"),
          col("col._2").as("o_orderkey"),
          col("col._3").as("o_totalprice"),
          (col("pos") + 1).cast("int").as("rn"))
    },

    // Distinct aggregation (Spark-native bonus; SURVEY §2.7).
    "q21_distinct_agg" -> { (s, dir) =>
      val sup = Tables.load(s, dir, "supplier")
      val n = Tables.load(s, dir, "nation")
      sup.join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          countDistinct(col("s_suppkey")).as("n_suppliers"),
          round(avg(col("s_acctbal")), 2).as("avg_acctbal"))
    },

    // Scalar function library breadth (date/string/math) — the reference
    // has no scalar functions at all (SURVEY §2.7); these are Spark
    // built-ins with exact DuckDB twins.
    "q22_scalar_functions" -> { (s, dir) =>
      Tables.load(s, dir, "orders")
        .filter(col("o_orderkey") < 100)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mon"),
          dayofmonth(col("o_orderdate")).as("dom"),
          upper(substring(col("o_orderpriority"), 1, 3)).as("prio3"),
          length(col("o_orderstatus")).as("st_len"),
          floor(col("o_totalprice")).as("price_floor"),
          round(sqrt(col("o_totalprice")), 4).as("price_sqrt"),
          concat(col("o_orderstatus"), lit("-"), col("o_orderpriority")).as("tag"))
    },

    // CUBE grouping sets (Spark-native bonus).
    "q23_cube" -> { (s, dir) =>
      Tables.load(s, dir, "orders")
        .withColumn("yr", year(col("o_orderdate")))
        .cube(col("o_orderstatus"), col("yr"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("sum_price"))
    },

    // binSort through the typed DSet facade (reference `DKV.fs:140-169`);
    // oracle checks the multiset is preserved (order is asserted in the
    // ScalaTest spec — the driver compare is order-insensitive).
    "q20_binsort_keys" -> { (s, dir) =>
      import s.implicits._
      import graft.dset.DSet._
      val kv = new DSet(
        Tables.load(s, dir, "lineitem")
          .filter(col("l_orderkey") < 1000)
          .select(col("l_orderkey"), col("l_linenumber")).as[(Long, Int)])
      kv.binSortPByKey(8)(k => (k % 8).toInt)
        .ds.toDF("l_orderkey", "l_linenumber")
    }
  )

  val oracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity),2) AS sum_qty,
         round(sum(l_extendedprice),2) AS sum_base_price,
         round(sum(l_extendedprice*(1.0-l_discount)),2) AS sum_disc_price,
         round(avg(l_quantity),2) AS avg_qty,
         round(avg(l_discount),2) AS avg_disc,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus""",
    "q2_selective_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount
         FROM lineitem
         WHERE l_quantity >= 49 AND l_shipdate >= TIMESTAMP '2000-01-01'""",
    "q3_revenue_by_segment" ->
      """SELECT c_mktsegment,
         round(sum(l_extendedprice*(1.0-l_discount)),2) AS revenue,
         count(*) AS n_items
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE o_orderdate >= TIMESTAMP '1997-01-01'
         GROUP BY c_mktsegment""",
    "q4_priority_exists" ->
      """SELECT o_orderpriority, count(*) AS order_count
         FROM orders WHERE EXISTS (
           SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
         GROUP BY o_orderpriority""",
    "q5_nation_revenue" ->
      """SELECT n_name,
         round(sum(l_extendedprice*(1.0-l_discount)),2) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1998-01-01'
         GROUP BY n_name""",
    "q6_forecast_revenue" ->
      """SELECT round(sum(l_extendedprice*l_discount),2) AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
           AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",
    "q7_top_orders_per_cust" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn::INTEGER AS rn FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
           FROM orders) WHERE rn <= 2""",
    // `carried` covers original nulls too (the Spark side marks v IS
    // NULL, not just the click rewrite).
    "ql2_locf_fill" ->
      """SELECT event_id, user_id,
           last_value(CASE WHEN event_type = 'click' THEN NULL ELSE value END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled,
           (event_type = 'click' OR value IS NULL) AS carried
         FROM events""",
    "ql1_window_analytics" ->
      """SELECT o_custkey, o_orderkey,
           round(lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS prev_price,
           round(lead(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS next_price,
           ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS quartile,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS UNBOUNDED PRECEDING), 2) AS running_spend
         FROM orders""",
    "q8_rollup_status_priority" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
         round(sum(o_totalprice),2) AS sum_price
         FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""",
    "q9_distinct_flags" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q10_nations_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
         INTERSECT
         SELECT s_nationkey AS nationkey FROM supplier""",
    "q11_quantities_except" ->
      """SELECT l_quantity AS qty FROM lineitem
         EXCEPT
         SELECT l_quantity AS qty FROM lineitem WHERE l_quantity > 10""",
    "q12_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""",
    "q13_orders_per_customer" ->
      """SELECT c_count, count(*) AS custdist FROM (
           SELECT c_custkey, count(o_orderkey) AS c_count
           FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
           GROUP BY c_custkey) GROUP BY c_count""",
    "q14_theta_crossjoin" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
         WHERE r_regionkey <> n_regionkey""",
    "q15_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
         count(*) AS n_events, round(sum(value),2) AS sum_value
         FROM events GROUP BY 1, 2""",
    "q16_events_json" ->
      """SELECT event_type,
         round(avg(CAST(props->>'$.k' AS INTEGER)),2) AS avg_k,
         count(*) AS n
         FROM events GROUP BY event_type""",
    "q17_wordcount" ->
      """SELECT word, count(*) AS cnt FROM (
           SELECT unnest(string_split(text, ' ')) AS word FROM documents)
         WHERE word <> '' GROUP BY word""",
    "q18_fold_total_qty" ->
      "SELECT round(sum(l_quantity),2) AS total_qty FROM lineitem",
    "q19_mapreduce_wordcount" ->
      """SELECT word, count(*) AS cnt FROM (
           SELECT unnest(string_split(text, ' ')) AS word FROM documents)
         WHERE word <> '' GROUP BY word""",
    "q20_binsort_keys" ->
      "SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_orderkey < 1000",
    "q21_distinct_agg" ->
      """SELECT n_name, count(DISTINCT s_suppkey) AS n_suppliers,
         round(avg(s_acctbal), 2) AS avg_acctbal
         FROM supplier JOIN nation ON s_nationkey = n_nationkey
         GROUP BY n_name""",
    "qagg_variance" ->
      """SELECT l_returnflag, round(var_samp(l_quantity), 2) AS var_qty
         FROM lineitem GROUP BY l_returnflag""",
    "qtopk_per_cust_agg" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn::INTEGER AS rn FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
           FROM orders) WHERE rn <= 2""",
    "q22_scalar_functions" ->
      """SELECT o_orderkey,
           date_part('year', o_orderdate)::INT AS yr,
           date_part('month', o_orderdate)::INT AS mon,
           date_part('day', o_orderdate)::INT AS dom,
           upper(substring(o_orderpriority, 1, 3)) AS prio3,
           length(o_orderstatus)::INT AS st_len,
           floor(o_totalprice)::BIGINT AS price_floor,
           round(sqrt(o_totalprice), 4) AS price_sqrt,
           o_orderstatus || '-' || o_orderpriority AS tag
         FROM orders WHERE o_orderkey < 100""",
    "q23_cube" ->
      """SELECT o_orderstatus, date_part('year', o_orderdate)::INT AS yr,
           count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
         FROM orders GROUP BY CUBE(o_orderstatus, yr)"""
  )
}
