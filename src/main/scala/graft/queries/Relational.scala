package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Tables.t

/** Relational operator inventory over the TPC-H-ish star schema
  * (SURVEY.md §2.4): filters, projections, partial+final aggregation,
  * equi/broadcast/semi/anti joins, distinct, rollup/grouping-sets,
  * window functions, set ops, top-k.
  *
  * Determinism contract (SURVEY.md §7.4): every query ends in a total
  * ORDER BY; money sums go through DECIMAL (associative, partitioning-
  * independent — a double sum would depend on shuffle order at 100 TB)
  * and are emitted as DOUBLE cast from that exact decimal.
  */
object Relational {

  // sum(CAST(x AS DECIMAL(18,2))) — exact & associative, then one cast out.
  private def dsum(c: org.apache.spark.sql.Column, scale: Int = 2) =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-style pricing summary: scan-filter + 2-phase hash agg.
    "q1_pricing_summary" -> ((s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .filter($"l_shipdate" <= lit("1999-12-01").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          dsum($"l_quantity").as("sum_qty"),
          dsum($"l_extendedprice").as("sum_base_price"),
          dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    // The spark.sql surface: identical semantics to q1 expressed as ANSI
    // SQL over temp views — same Catalyst plan, same oracle.
    "sql_q1" -> ((s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("lineitem_v")
      s.sql(
        """SELECT l_returnflag, l_linestatus,
          | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
          | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
          | CAST(SUM(CAST(l_extendedprice * (1.0d - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
          | COUNT(*) AS count_order
          |FROM lineitem_v WHERE l_shipdate <= TIMESTAMP '1999-12-01'
          |GROUP BY l_returnflag, l_linestatus
          |ORDER BY l_returnflag, l_linestatus""".stripMargin)
    }),

    // Lateral join: per nation, its top-2 customers by balance — the
    // correlated-subquery-in-FROM operator (Catalyst LateralJoin,
    // decorrelated to a ranked window under the hood). The per-group
    // LIMIT bounds state per key, so the shape holds at any fan-in.
    "q_lateral_topk" -> ((s, d) => {
      t(s, d, "nation").createOrReplaceTempView("nation_v")
      t(s, d, "customer").createOrReplaceTempView("customer_v")
      s.sql(
        """SELECT n_name, c.c_name, c.c_acctbal
          |FROM nation_v,
          | LATERAL (SELECT c_name, c_acctbal FROM customer_v
          |          WHERE c_nationkey = n_nationkey
          |          ORDER BY c_acctbal DESC, c_name LIMIT 2) c
          |ORDER BY n_name, c_acctbal DESC, c_name""".stripMargin)
    }),

    // TPC-H Q3-style: 3-way join, agg, top-k. No broadcast hint on
    // customer — it scales with the data (forcing it would OOM at
    // 100 TB); Catalyst/AQE picks broadcast vs shuffle join from size.
    "q3_top_orders" -> ((s, d) => {
      import s.implicits._
      val cust  = t(s, d, "customer").filter($"c_mktsegment" === "BUILDING")
      val ord   = t(s, d, "orders").filter($"o_orderdate" < lit("2000-01-01").cast("timestamp"))
      val li    = t(s, d, "lineitem").filter($"l_shipdate" > lit("2000-01-01").cast("timestamp"))
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(cust, $"o_custkey" === $"c_custkey")
        .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
        .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4).as("revenue"))
        .select($"l_orderkey", $"revenue",
          date_format($"o_orderdate", "yyyy-MM-dd").as("o_date"), $"o_orderpriority")
        .orderBy(desc("revenue"), asc("o_date"), asc("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5-style: 5-way join with broadcast dims, per-nation revenue.
    "q5_nation_revenue" -> ((s, d) => {
      import s.implicits._
      val li  = t(s, d, "lineitem")
      val ord = t(s, d, "orders")
      val cst = t(s, d, "customer")
      val sup = t(s, d, "supplier")
      val nat = t(s, d, "nation")
      val reg = t(s, d, "region")
      // broadcast hints only on the FIXED-size dims (nation: 25 rows,
      // region: 5 at any scale factor); supplier/customer scale with the
      // data and are left to Catalyst/AQE
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(cst, $"o_custkey" === $"c_custkey")
        .join(sup,
          $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
        .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
        .groupBy($"n_name")
        .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"n_name")
    }),

    // Left-semi join ≙ EXISTS.
    "q_semi_orders" -> ((s, d) => {
      import s.implicits._
      val big = t(s, d, "lineitem").filter($"l_quantity" > 45)
      t(s, d, "orders")
        .join(big, $"o_orderkey" === $"l_orderkey", "left_semi")
        .select($"o_orderkey")
        .orderBy($"o_orderkey")
    }),

    // Left-anti join ≙ NOT EXISTS: customers with no urgent order.
    "q_anti_customers" -> ((s, d) => {
      import s.implicits._
      val urgent = t(s, d, "orders").filter($"o_orderpriority" === "1-URGENT")
      t(s, d, "customer")
        .join(urgent, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    }),

    // Top-k after join+agg (TakeOrderedAndProject).
    "q_topk_customers" -> ((s, d) => {
      import s.implicits._
      t(s, d, "orders")
        .join(t(s, d, "customer"), $"o_custkey" === $"c_custkey")
        .groupBy($"c_custkey", $"c_name")
        .agg(dsum($"o_totalprice").as("total_spend"), count(lit(1)).as("n_orders"))
        .orderBy(desc("total_spend"), asc("c_custkey"))
        .limit(10)
    }),

    // Revenue concentration (the Pareto table): share of total order
    // revenue captured by the top 1/5/10/25/50 % of customers.
    // Everything is exact until the final divides: per-customer
    // revenue folds in DECIMAL(18,2) and publishes as integer CENTS,
    // ranks are ROW_NUMBER over the CUSTOMER AGGREGATE (the sort is
    // |customers|-sized, never |orders|-sized), cutoffs are the exact
    // ceil (n·p + 99) div 100, and each share is one double divide of
    // DECIMAL(38,0) sums. The 5-cutoff lattice joins as a broadcast
    // BNLJ (allowlisted — 5 rows by construction at any scale).
    "q_revenue_concentration" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val rev = t(s, d, "orders").groupBy($"o_custkey")
        .agg(expr("cast(cast(sum(cast(o_totalprice as decimal(18,2)))" +
          " * 100 as decimal(38,0)) as bigint)").as("cents"))
      val ranked = rev.withColumn("rn", row_number().over(
        Window.orderBy($"cents".desc, $"o_custkey")).cast("long"))
      val stats = rev.agg(count(lit(1)).as("n"),
        sum(expr("cast(cents as decimal(38,0))")).as("total"))
      val withK = s.range(1)
        .select(explode(expr("array(1, 5, 10, 25, 50)")).as("pct"))
        .crossJoin(broadcast(stats))
        .select($"pct".cast("long").as("pct"),
          expr("cast((n * pct + 99) div 100 as bigint)")
            .as("k_customers"),
          $"total")
      ranked.join(broadcast(withK), $"rn" <= $"k_customers")
        .groupBy($"pct", $"k_customers", $"total")
        .agg(sum(expr("cast(cents as decimal(38,0))")).as("cum"))
        .select($"pct", $"k_customers",
          round($"cum".cast("double") / $"total".cast("double"), 4)
            .as("revenue_share"))
        .orderBy($"pct")
    }),

    // Market-basket brand affinity over orders — the co-occurrence
    // lift table (the log_cooccurrence shape restated on TPC-H): for
    // brand pairs appearing in the same order, support n_both and
    // lift = P(ab)/(P(a)·P(b)) = n_both·N / (n_a·n_b) as an exact e6
    // integer floor. The pair join is ORDER-KEYED (brands-per-order
    // is small, so pairs ≈ 6·|orders| — never brand² × orders), the
    // per-brand document frequencies are one agg, and the output is
    // bounded by the brand alphabet; top-20 by support.
    "q_basket_pairs" -> ((s, d) => {
      import s.implicits._
      val li = t(s, d, "lineitem")
        .join(t(s, d, "part"), $"l_partkey" === $"p_partkey")
        .select($"l_orderkey".as("ok"), $"p_brand".as("brand"))
        .distinct()
      val tot = li.agg(countDistinct($"ok").as("n_orders"))
      val bc = li.groupBy($"brand").agg(count(lit(1)).as("n_b"))
      val pairs = li.as("a").join(li.as("b"),
          $"a.ok" === $"b.ok" && $"a.brand" < $"b.brand")
        .groupBy($"a.brand".as("brand_a"), $"b.brand".as("brand_b"))
        .agg(count(lit(1)).as("n_both"))
      pairs
        .join(bc.select($"brand".as("brand_a"), $"n_b".as("na")),
          "brand_a")
        .join(bc.select($"brand".as("brand_b"), $"n_b".as("nb")),
          "brand_b")
        .crossJoin(broadcast(tot))
        .select($"brand_a", $"brand_b", $"n_both",
          round(expr("cast(cast(n_both as decimal(38,0)) * n_orders" +
            " * 1000000 div (cast(na as decimal(38,0)) * nb)" +
            " as bigint)").cast("double") / 1e6, 4).as("lift"))
        .orderBy($"n_both".desc, $"brand_a", $"brand_b").limit(20)
        .orderBy($"n_both".desc, $"brand_a", $"brand_b")
    }),

    // ROLLUP (partial-agg friendly; L7 generalization).
    "q_rollup_orders" -> ((s, d) => {
      import s.implicits._
      t(s, d, "orders")
        .rollup($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("total"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))
    }),

    // GROUPING SETS — the reference's log_analyzer computes three
    // group-counts in one pass (L7); grouping sets is the relational form.
    "q_grouping_sets" -> ((s, d) => {
      import s.implicits._
      t(s, d, "orders")
        .groupingSets(
          Seq(Seq($"o_orderstatus"), Seq($"o_orderpriority"), Seq()),
          $"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"), asc("n"))
    }),

    // Window: top-3 orders per customer (row_number, total tie-break).
    "q_window_top3" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3)
        .select($"o_custkey", $"o_orderkey", $"rn".cast("long").as("rn"))
        .orderBy($"o_custkey", $"rn")
    }),

    // Window: running per-customer spend (decimal frame sum — exact).
    "q_window_running" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders")
        .withColumn("running",
          sum($"o_totalprice".cast(DecimalType(18, 2))).over(w).cast("double"))
        .select($"o_custkey", $"o_orderkey", $"running")
        .orderBy($"o_custkey", $"o_orderkey")
    }),

    // Exact distinct (L8) per group.
    "q_distinct_parts" -> ((s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .groupBy($"l_returnflag")
        .agg(countDistinct($"l_partkey").as("n_parts"),
          countDistinct($"l_suppkey").as("n_supps"))
        .orderBy($"l_returnflag")
    }),

    // Set ops: INTERSECT / EXCEPT / UNION (distinct semantics).
    "q_intersect_nations" -> ((s, d) => {
      import s.implicits._
      t(s, d, "customer").select($"c_nationkey".as("nk"))
        .intersect(t(s, d, "supplier").select($"s_nationkey".as("nk")))
        .orderBy($"nk")
    }),
    // EXCEPT against the HIGH-BALANCE suppliers only: nations with
    // customers but no s_acctbal>9500 supplier. The unfiltered version
    // returns 0 rows once suppliers cover every nation (already true at
    // sf0.01), making the oracle row trivially green — the filtered set
    // stays non-empty at every tested SF (25/21/4 rows).
    "q_except_nations" -> ((s, d) => {
      import s.implicits._
      t(s, d, "customer").select($"c_nationkey".as("nk"))
        .except(t(s, d, "supplier")
          .filter($"s_acctbal" > 9500).select($"s_nationkey".as("nk")))
        .orderBy($"nk")
    }),
    "q_union_nations" -> ((s, d) => {
      import s.implicits._
      t(s, d, "customer").select($"c_nationkey".as("nk"))
        .union(t(s, d, "supplier").select($"s_nationkey".as("nk")))
        .distinct()
        .orderBy($"nk")
    }),

    // HAVING-style post-agg filter.
    "q_agg_having" -> ((s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .groupBy($"l_orderkey")
        .agg(count(lit(1)).as("n_lines"), dsum($"l_quantity").as("sum_qty"))
        .filter($"n_lines" >= 5)
        .orderBy($"l_orderkey")
    }),

    // Left outer join with null-preserving aggregation.
    "q_left_join_orders" -> ((s, d) => {
      import s.implicits._
      t(s, d, "customer")
        .join(t(s, d, "orders"), $"c_custkey" === $"o_custkey", "left_outer")
        .groupBy($"c_custkey")
        .agg(count($"o_orderkey").as("n_orders"),
          date_format(min($"o_orderdate"), "yyyy-MM-dd").as("first_order"))
        .orderBy($"c_custkey")
    }),

    // Full outer join over per-nation aggregates.
    "q_full_outer_nations" -> ((s, d) => {
      import s.implicits._
      val cn = t(s, d, "customer").groupBy($"c_nationkey".as("nk"))
        .agg(count(lit(1)).as("n_cust"))
      val sn = t(s, d, "supplier").groupBy($"s_nationkey".as("nk"))
        .agg(count(lit(1)).as("n_supp"))
      cn.join(sn, Seq("nk"), "full_outer")
        .orderBy($"nk")
    }),

    // UNION ALL (bag semantics).
    "q_union_all" -> ((s, d) => {
      import s.implicits._
      t(s, d, "customer").select(lit("cust").as("src"))
        .unionAll(t(s, d, "supplier").select(lit("supp").as("src")))
        .groupBy($"src").agg(count(lit(1)).as("n"))
        .orderBy($"src")
    }),

    // CUBE over two dims.
    "q_cube_orders" -> ((s, d) => {
      import s.implicits._
      t(s, d, "orders")
        .cube($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("o_orderstatus"),
          asc_nulls_first("o_orderpriority"), asc("n"))
    }),

    // Scalar subquery: customers above the mean balance. The comparison
    // is cross-multiplied (bal * n > sum) so it stays in exact decimal
    // arithmetic — no float-division boundary between engines.
    "q_above_avg_customers" -> ((s, d) => {
      import s.implicits._
      val cust = t(s, d, "customer")
      val stats = cust.agg(count(lit(1)).as("n"),
        sum($"c_acctbal".cast(DecimalType(18, 2))).as("s"))
      cust.crossJoin(broadcast(stats))
        .filter($"c_acctbal".cast(DecimalType(18, 2)) * $"n" > $"s")
        .select($"c_custkey", $"c_name", $"c_acctbal".as("acctbal"))
        .orderBy($"c_custkey")
    }),

    // Date/math function family over o_orderdate.
    "q_date_math" -> ((s, d) => {
      import s.implicits._
      t(s, d, "orders")
        .select($"o_orderdate",
          year($"o_orderdate").cast("long").as("y"),
          month($"o_orderdate").cast("long").as("m"),
          quarter($"o_orderdate").cast("long").as("q"),
          (dayofweek($"o_orderdate") - 1).cast("long").as("dow"))
        .groupBy($"y", $"m")
        .agg(max($"q").as("q"), count(lit(1)).as("n"),
          sum(when($"dow" === 0 || $"dow" === 6, 1L).otherwise(0L)).as("n_weekend"),
          date_format(min($"o_orderdate"), "yyyy-MM-dd").as("first_day"))
        .orderBy($"y", $"m")
    }),

    // NULL-handling functions: nullif / coalesce / null-skipping count.
    "q_null_handling" -> ((s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .select($"l_returnflag", nullif($"l_discount", lit(0.0)).as("disc"))
        .groupBy($"l_returnflag")
        .agg(count($"disc").as("n_discounted"),
          (count(lit(1)) - count($"disc")).as("n_zero_disc"),
          sum(coalesce($"disc", lit(0.05)).cast(DecimalType(18, 2)))
            .cast("double").as("disc_imputed"))
        .orderBy($"l_returnflag")
    }),

    // Pivot (crosstab): order counts by status × priority. Expressed as
    // groupBy().pivot() in Spark; the oracle uses portable CASE sums.
    "q_pivot_status" -> ((s, d) => {
      import s.implicits._
      t(s, d, "orders")
        .groupBy($"o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .toDF("o_orderpriority", "n_f", "n_o", "n_p")
        .orderBy($"o_orderpriority")
    }),

    // Stratified sampling: k deterministic rows per group, ordered by
    // content hash — the training-data-pipeline "balanced subset" op.
    // The row_number()<=k pattern plans through the custom TopKPerKey
    // operator (graft.plans) under the oracle contract.
    "q_stratified_sample" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_orderpriority")
        .orderBy(md5($"o_orderkey".cast("string").cast("binary")).asc,
          $"o_orderkey".asc)
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 5)
        .select($"o_orderpriority", $"o_orderkey", $"rn".cast("long").as("rn"))
        .orderBy($"o_orderpriority", $"rn")
    }),

    // IN-subquery (planned as a semi join).
    "q_in_subquery" -> ((s, d) => {
      import s.implicits._
      val rich = t(s, d, "customer").filter($"c_acctbal" > 9000.0)
        .select($"c_custkey")
      t(s, d, "orders")
        .join(rich, $"o_custkey" === $"c_custkey", "left_semi")
        .select($"o_orderkey", $"o_custkey")
        .orderBy($"o_orderkey")
    }),

    // Deterministic sampling: content-hash filter instead of random() —
    // reproducible on any engine and stable under re-partitioning.
    "q_sample_hash" -> ((s, d) => {
      import s.implicits._
      t(s, d, "orders")
        .filter(substring(md5($"o_orderkey".cast("string").cast("binary")), 1, 1)
          .isin("0", "1"))
        .select($"o_orderkey", $"o_orderstatus")
        .orderBy($"o_orderkey")
    }),

    // String function family: pad, reverse, translate, edit distance.
    "q_string_funcs" -> ((s, d) => {
      import s.implicits._
      t(s, d, "part")
        .filter($"p_partkey" <= 100)
        .select($"p_partkey",
          lpad($"p_brand", 12, "*").as("padded"),
          reverse($"p_name").as("rev_name"),
          translate($"p_type", "ae", "@3").as("leeted"),
          levenshtein($"p_brand", lit("Brand#11")).cast("long").as("edit_dist"),
          length($"p_name").cast("long").as("name_len"))
        .orderBy($"p_partkey")
    }),

    // Math function family (identical-operand arithmetic, rounded).
    "q_math_funcs" -> ((s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .filter($"l_orderkey" <= 100)
        .select($"l_orderkey", $"l_linenumber".cast("long").as("ln"),
          round(sqrt($"l_extendedprice"), 6).as("sqrt_price"),
          round(exp($"l_discount"), 6).as("exp_disc"),
          round(log($"l_extendedprice"), 6).as("ln_price"),
          round(pow($"l_quantity", lit(2)), 2).as("qty_sq"),
          ceil($"l_extendedprice").cast("long").as("ceil_price"),
          floor($"l_extendedprice").cast("long").as("floor_price"),
          signum($"l_discount" - 0.05).cast("long").as("disc_sign"),
          greatest($"l_tax", $"l_discount").as("max_rate"))
        .orderBy($"l_orderkey", $"ln")
    }),

    // Statistical aggregates (correlation / population covariance and
    // stddev / mean): all are mergeable co-moment sketches — two-phase
    // partial+final HashAggregate, constant state per group, identical
    // shape at any scale. Rounded to absorb co-moment fold-order ulps.
    "q_stats_funcs" -> ((s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"),
          round(corr($"l_quantity", $"l_extendedprice"), 6)
            .as("qty_price_corr"),
          round(covar_pop($"l_quantity", $"l_extendedprice"), 2)
            .as("qty_price_cov"),
          round(stddev_pop($"l_quantity"), 6).as("qty_sd"),
          round(avg($"l_quantity"), 6).as("qty_mean"))
        .orderBy($"l_returnflag")
    }),

    // Blocked fuzzy (edit-distance) join over the brand vocabulary:
    // candidates must share a blocking key (first digit of the brand
    // number) and pass levenshtein <= 1 — the standard scale shape for
    // fuzzy matching (block equi-join prunes the quadratic space; the
    // DP distance runs only inside blocks; cross-block typos are the
    // documented blocking trade-off). Classic integer edit distance is
    // bit-identical across engines.
    "q_fuzzy_brands" -> ((s, d) => {
      import s.implicits._
      val brands = t(s, d, "part").select($"p_brand").distinct()
        .select($"p_brand", substring($"p_brand", 7, 1).as("blk"))
      brands.as("a").join(brands.as("b"),
          $"a.blk" === $"b.blk" && $"a.p_brand" < $"b.p_brand")
        .select($"a.p_brand".as("brand_a"), $"b.p_brand".as("brand_b"),
          levenshtein($"a.p_brand", $"b.p_brand").cast("long").as("dist"))
        .filter($"dist" <= 1)
        .orderBy($"brand_a", $"brand_b")
    }),

    // String/case projection over part.
    "q_part_brand_stats" -> ((s, d) => {
      import s.implicits._
      t(s, d, "part")
        .groupBy($"p_brand")
        .agg(count(lit(1)).as("n"),
          min($"p_size").as("min_size"),
          max($"p_size").as("max_size"),
          countDistinct($"p_type").as("n_types"))
        .orderBy($"p_brand")
    }),

    // TPC-H Q7-style nation-to-nation trade: 5-way join with the nation
    // dim joined in TWO roles (supplier's and customer's). The two
    // nation sides broadcast (fixed 25 rows at any scale); the
    // lineitem-orders-customer chain is left to Catalyst/AQE to order —
    // at 100 TB the join order (filter early, big-to-big last) is the
    // whole game, and declaring it lets the optimizer use stats.
    "q7_nation_trade" -> ((s, d) => {
      import s.implicits._
      val n1 = broadcast(t(s, d, "nation"))
        .select($"n_nationkey".as("s_nk"), $"n_name".as("supp_nation"))
      val n2 = broadcast(t(s, d, "nation"))
        .select($"n_nationkey".as("c_nk"), $"n_name".as("cust_nation"))
      t(s, d, "lineitem")
        .join(t(s, d, "orders"), $"l_orderkey" === $"o_orderkey")
        .join(t(s, d, "customer"), $"o_custkey" === $"c_custkey")
        .join(t(s, d, "supplier"), $"l_suppkey" === $"s_suppkey")
        .join(n1, $"s_nationkey" === $"s_nk")
        .join(n2, $"c_nationkey" === $"c_nk")
        .filter($"supp_nation" < $"cust_nation")
        .groupBy($"supp_nation", $"cust_nation",
          year($"l_shipdate").cast("long").as("l_year"))
        .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4)
          .as("revenue"))
        .orderBy($"supp_nation", $"cust_nation", $"l_year")
    }),

    // TPC-H Q10-style returned-item ranking: which customers returned the
    // most value in a quarter — scan-filter on both fact tables, 3-way
    // join, revenue agg, top-20. The nation dim broadcasts; order/customer
    // join order is Catalyst's call.
    "q10_returned_value" -> ((s, d) => {
      import s.implicits._
      val li = t(s, d, "lineitem").filter($"l_returnflag" === "R")
      val ord = t(s, d, "orders")
        .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1996-04-01").cast("timestamp"))
      ord.join(li, $"o_orderkey" === $"l_orderkey")
        .join(t(s, d, "customer"), $"o_custkey" === $"c_custkey")
        .join(broadcast(t(s, d, "nation")), $"c_nationkey" === $"n_nationkey")
        .groupBy($"c_custkey", $"c_name", $"n_name")
        .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4)
          .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(desc("revenue"), asc("c_custkey"))
        .limit(20)
    }),

    // Unpivot (wide → long): per-lineitem measure columns melted into
    // (measure, value) rows via stack — the inverse of q_pivot_status.
    // Aggregated per measure so the output is small and the decimal-sum
    // parity rules apply.
    "q_unpivot_measures" -> ((s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .select($"l_orderkey", expr(
          "stack(3, 'quantity', l_quantity, 'price', l_extendedprice," +
            " 'discount', l_discount) as (measure, val)"))
        .groupBy($"measure")
        .agg(count(lit(1)).as("n"),
          dsum($"val", 4).as("total"),
          round(min($"val"), 4).as("min_val"),
          round(max($"val"), 4).as("max_val"))
        .orderBy($"measure")
    }),

    // NOT EXISTS with a range residual: orders where NO line shipped
    // within 30 days of ordering — left-anti hash join on the equi part
    // with the date bound as residual (no row explosion, same shape as
    // the EXISTS twin above).
    "q_not_exists_late" -> ((s, d) => {
      import s.implicits._
      t(s, d, "orders").as("o")
        .join(t(s, d, "lineitem").as("l"),
          $"l.l_orderkey" === $"o.o_orderkey" &&
            $"l.l_shipdate" <= $"o.o_orderdate" + expr("INTERVAL 30 DAYS"),
          "left_anti")
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n_orders"), min($"o_orderkey").as("min_ok"))
        .orderBy($"o_orderstatus")
    }),

    // TPC-H Q6-style forecasting-revenue change: pure scan-filter + one
    // global agg — the canonical predicate-pushdown showcase (all three
    // filters reach the parquet scan as PushedFilters; only 4 columns
    // read).
    "q6_revenue_delta" -> ((s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1997-01-01").cast("timestamp") &&
          $"l_discount".between(0.05, 0.07) && $"l_quantity" < 24)
        .agg(dsum($"l_extendedprice" * $"l_discount", 4).as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // TPC-H Q4-style order-priority check: correlated EXISTS via a
    // left-semi join with a mixed equi + range condition (hash join on
    // the equi part, the range as a join residual — no row explosion).
    "q4_priority_exists" -> ((s, d) => {
      import s.implicits._
      val li = t(s, d, "lineitem")
      t(s, d, "orders").as("o")
        .join(li.as("l"),
          $"l.l_orderkey" === $"o.o_orderkey" &&
            $"l.l_shipdate" > $"o.o_orderdate" + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy($"o_orderpriority")
    }),

    // Window-function family: lag/lead, first_value, ntile, percent_rank,
    // cume_dist over a per-customer frame with a total order (o_orderkey
    // is unique). One shuffle + one sort; all functions share the frame.
    "q_window_funcs" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderkey")
      t(s, d, "orders")
        .select($"o_custkey", $"o_orderkey",
          lag($"o_totalprice", 1).over(w).as("prev_price"),
          lead($"o_totalprice", 1).over(w).as("next_price"),
          first_value($"o_orderkey").over(w).as("first_ok"),
          ntile(4).over(w).cast("long").as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cum_dist"))
        .orderBy($"o_custkey", $"o_orderkey")
    }),

    // RANGE frame (value-based, not row-based): per customer, total spend
    // over orders whose key lies within 1000 of the current one. Frames
    // defined by VALUES are deterministic under ties by construction.
    "q_range_frame" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderkey")
        .rangeBetween(-1000L, Window.currentRow)
      t(s, d, "orders")
        .select($"o_custkey", $"o_orderkey",
          sum($"o_totalprice".cast(DecimalType(18, 2))).over(w)
            .cast("double").as("nearby_spend"))
        .orderBy($"o_custkey", $"o_orderkey")
    }),

    // Incremental (delta-maintained) aggregation — materialized-view
    // maintenance, THE 100 TB refresh pattern: a nightly summary is
    // kept as mergeable partial state (count + DECIMAL sum per group)
    // and a late-arriving delta batch (o_orderkey % 10 = 7 simulates
    // it) folds in WITHOUT rescanning the base — merge = one agg over
    // the two partial-state tables (group-count-bounded, not
    // data-bounded). The query also runs the full recompute and
    // publishes a per-group `consistent` bit proving merge ≡
    // recompute exactly (DECIMAL partials are associative, so the
    // equality is exact, not approximate — the reason money sums ride
    // DECIMAL everywhere in this repo). At scale the full-recompute
    // branch is the audit you run on a sampled partition, not nightly.
    "q_incremental_agg" -> ((s, d) => {
      import s.implicits._
      val o = t(s, d, "orders").select($"o_orderstatus".as("st"),
        $"o_orderkey", $"o_totalprice".cast(DecimalType(18, 2)).as("p"))
      def part(df: DataFrame) = df.groupBy($"st")
        .agg(count(lit(1)).as("n"), sum($"p").as("sp"))
      val base = part(o.filter($"o_orderkey" % 10 =!= 7))
      val delta = part(o.filter($"o_orderkey" % 10 === 7))
      val merged = base.unionAll(delta).groupBy($"st")
        .agg(sum($"n").as("n_merged"), sum($"sp").as("sp_merged"))
      val full = part(o)
        .select($"st", $"n".as("n_full"), $"sp".as("sp_full"))
      merged.join(full, "st")
        .join(base.select($"st", $"n".as("n_base")), Seq("st"),
          "left_outer")
        .select($"st".as("o_orderstatus"),
          coalesce($"n_base", lit(0L)).as("n_base"),
          ($"n_merged" - coalesce($"n_base", lit(0L))).as("n_delta"),
          $"n_merged",
          $"sp_merged".cast("double").as("total_merged"),
          (($"n_merged" === $"n_full") &&
            ($"sp_merged" === $"sp_full")).cast("bigint").as("consistent"))
        .orderBy($"o_orderstatus")
    }))

  val oracle: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        | COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-12-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_lateral_topk" ->
      """SELECT n_name, c.c_name, c.c_acctbal
        |FROM nation,
        | LATERAL (SELECT c_name, c_acctbal FROM customer
        |          WHERE c_nationkey = n_nationkey
        |          ORDER BY c_acctbal DESC, c_name LIMIT 2) c
        |ORDER BY n_name, c_acctbal DESC, c_name""".stripMargin,

    "sql_q1" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        | COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-12-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_top_orders" ->
      """SELECT l_orderkey,
        | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        | strftime(o_orderdate, '%Y-%m-%d') AS o_date, o_orderpriority
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '2000-01-01'
        |  AND l_shipdate > TIMESTAMP '2000-01-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_date, l_orderkey LIMIT 10""".stripMargin,

    "q5_nation_revenue" ->
      """SELECT n_name,
        | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        | COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_semi_orders" ->
      """SELECT o_orderkey FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |ORDER BY o_orderkey""".stripMargin,

    "q_anti_customers" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "q_topk_customers" ->
      """SELECT c_custkey, c_name,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
        | COUNT(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY total_spend DESC, c_custkey LIMIT 10""".stripMargin,

    "q_revenue_concentration" ->
      """WITH rc AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
        |      AS BIGINT) AS cents
        |  FROM orders GROUP BY o_custkey),
        |rk AS (
        |  SELECT o_custkey, cents,
        |    CAST(ROW_NUMBER() OVER (ORDER BY cents DESC, o_custkey)
        |      AS BIGINT) AS rn
        |  FROM rc),
        |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |         SUM(CAST(cents AS HUGEINT)) AS total FROM rc),
        |cu AS (
        |  SELECT CAST(pct AS BIGINT) AS pct,
        |    CAST((n * pct + 99) // 100 AS BIGINT) AS k_customers,
        |    total
        |  FROM (SELECT unnest([1, 5, 10, 25, 50]) AS pct), st)
        |SELECT c.pct, c.k_customers,
        |  ROUND(CAST(SUM(CAST(r.cents AS HUGEINT)) AS DOUBLE)
        |    / CAST(c.total AS DOUBLE), 4) AS revenue_share
        |FROM rk r JOIN cu c ON r.rn <= c.k_customers
        |GROUP BY c.pct, c.k_customers, c.total
        |ORDER BY c.pct""".stripMargin,

    "q_basket_pairs" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS ok, p_brand AS brand
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |tot AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_orders
        |        FROM li),
        |bc AS (SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_b
        |       FROM li GROUP BY brand),
        |pr AS (
        |  SELECT a.brand AS brand_a, b.brand AS brand_b,
        |    CAST(COUNT(*) AS BIGINT) AS n_both
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.brand < b.brand
        |  GROUP BY 1, 2),
        |j AS (
        |  SELECT pr.brand_a, pr.brand_b, pr.n_both,
        |    ROUND(CAST(CAST((CAST(pr.n_both AS HUGEINT) * tot.n_orders
        |      * 1000000) // (CAST(ba.n_b AS HUGEINT) * bb.n_b)
        |      AS BIGINT) AS DOUBLE) / 1e6, 4) AS lift
        |  FROM pr
        |  JOIN bc ba ON ba.brand = pr.brand_a
        |  JOIN bc bb ON bb.brand = pr.brand_b, tot),
        |cut AS (SELECT * FROM j
        |        ORDER BY n_both DESC, brand_a, brand_b LIMIT 20)
        |SELECT brand_a, brand_b, n_both, lift
        |FROM cut ORDER BY n_both DESC, brand_a, brand_b""".stripMargin,

    "q_rollup_orders" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST, n""".stripMargin,

    "q_window_top3" ->
      """SELECT o_custkey, o_orderkey, rn FROM (
        |  SELECT o_custkey, o_orderkey,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,

    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |   OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_distinct_parts" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
        | COUNT(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_intersect_nations" ->
      """SELECT c_nationkey AS nk FROM customer
        |INTERSECT SELECT s_nationkey AS nk FROM supplier
        |ORDER BY nk""".stripMargin,

    "q_except_nations" ->
      """SELECT c_nationkey AS nk FROM customer
        |EXCEPT SELECT s_nationkey AS nk FROM supplier WHERE s_acctbal > 9500
        |ORDER BY nk""".stripMargin,

    "q_union_nations" ->
      """SELECT c_nationkey AS nk FROM customer
        |UNION SELECT s_nationkey AS nk FROM supplier
        |ORDER BY nk""".stripMargin,

    "q_agg_having" ->
      """SELECT l_orderkey, COUNT(*) AS n_lines,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY l_orderkey HAVING COUNT(*) >= 5
        |ORDER BY l_orderkey""".stripMargin,

    "q_pivot_status" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_stratified_sample" ->
      """SELECT o_orderpriority, o_orderkey, rn FROM (
        |  SELECT o_orderpriority, o_orderkey,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY md5(CAST(o_orderkey AS VARCHAR)),
        |                                o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 5
        |ORDER BY o_orderpriority, rn""".stripMargin,

    "q_in_subquery" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_acctbal > 9000.0)
        |ORDER BY o_orderkey""".stripMargin,

    "q_sample_hash" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0', '1')
        |ORDER BY o_orderkey""".stripMargin,

    "q_string_funcs" ->
      """SELECT p_partkey,
        |  lpad(p_brand, 12, '*') AS padded,
        |  reverse(p_name) AS rev_name,
        |  translate(p_type, 'ae', '@3') AS leeted,
        |  CAST(levenshtein(p_brand, 'Brand#11') AS BIGINT) AS edit_dist,
        |  CAST(length(p_name) AS BIGINT) AS name_len
        |FROM part WHERE p_partkey <= 100 ORDER BY p_partkey""".stripMargin,

    "q_math_funcs" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS ln,
        |  ROUND(sqrt(l_extendedprice), 6) AS sqrt_price,
        |  ROUND(exp(l_discount), 6) AS exp_disc,
        |  ROUND(ln(l_extendedprice), 6) AS ln_price,
        |  ROUND(pow(l_quantity, 2), 2) AS qty_sq,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_price,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS floor_price,
        |  CAST(sign(l_discount - 0.05) AS BIGINT) AS disc_sign,
        |  greatest(l_tax, l_discount) AS max_rate
        |FROM lineitem WHERE l_orderkey <= 100
        |ORDER BY l_orderkey, ln""".stripMargin,

    "q_stats_funcs" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  ROUND(corr(l_quantity, l_extendedprice), 6) + 0.0
        |    AS qty_price_corr,
        |  ROUND(covar_pop(l_quantity, l_extendedprice), 2) + 0.0
        |    AS qty_price_cov,
        |  ROUND(stddev_pop(l_quantity), 6) AS qty_sd,
        |  ROUND(AVG(l_quantity), 6) AS qty_mean
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_fuzzy_brands" ->
      """WITH b AS (
        |  SELECT DISTINCT p_brand, substring(p_brand, 7, 1) AS blk
        |  FROM part)
        |SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
        |  CAST(levenshtein(a.p_brand, b.p_brand) AS BIGINT) AS dist
        |FROM b a JOIN b b ON a.blk = b.blk AND a.p_brand < b.p_brand
        |WHERE levenshtein(a.p_brand, b.p_brand) <= 1
        |ORDER BY brand_a, brand_b""".stripMargin,

    "q_part_brand_stats" ->
      """SELECT p_brand, COUNT(*) AS n, MIN(p_size) AS min_size,
        | MAX(p_size) AS max_size, COUNT(DISTINCT p_type) AS n_types
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q_left_join_orders" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
        | strftime(MIN(o_orderdate), '%Y-%m-%d') AS first_order
        |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "q_full_outer_nations" ->
      """SELECT COALESCE(cn.nk, sn.nk) AS nk, cn.n_cust, sn.n_supp
        |FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust
        |      FROM customer GROUP BY 1) cn
        |FULL OUTER JOIN (SELECT s_nationkey AS nk, COUNT(*) AS n_supp
        |                 FROM supplier GROUP BY 1) sn
        |  ON cn.nk = sn.nk
        |ORDER BY nk""".stripMargin,

    "q_union_all" ->
      """SELECT src, COUNT(*) AS n
        |FROM (SELECT 'cust' AS src FROM customer
        |      UNION ALL SELECT 'supp' FROM supplier)
        |GROUP BY src ORDER BY src""".stripMargin,

    "q_cube_orders" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST, n""".stripMargin,

    "q_above_avg_customers" ->
      """SELECT c_custkey, c_name, c_acctbal AS acctbal
        |FROM customer,
        |  (SELECT COUNT(*) AS n, SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS s
        |   FROM customer)
        |WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n > s
        |ORDER BY c_custkey""".stripMargin,

    "q_date_math" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
        | CAST(month(o_orderdate) AS BIGINT) AS m,
        | CAST(MAX(quarter(o_orderdate)) AS BIGINT) AS q,
        | COUNT(*) AS n,
        | CAST(SUM(CASE WHEN date_part('dow', o_orderdate) IN (0, 6)
        |               THEN 1 ELSE 0 END) AS BIGINT) AS n_weekend,
        | strftime(MIN(o_orderdate), '%Y-%m-%d') AS first_day
        |FROM orders GROUP BY y, m ORDER BY y, m""".stripMargin,

    "q_null_handling" ->
      """SELECT l_returnflag,
        | COUNT(nullif(l_discount, 0.0)) AS n_discounted,
        | COUNT(*) - COUNT(nullif(l_discount, 0.0)) AS n_zero_disc,
        | CAST(SUM(CAST(coalesce(nullif(l_discount, 0.0), 0.05) AS DECIMAL(18,2)))
        |      AS DOUBLE) AS disc_imputed
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q7_nation_trade" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        | CAST(year(l_shipdate) AS BIGINT) AS l_year,
        | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)))
        |      AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE n1.n_name < n2.n_name
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "q6_revenue_delta" ->
      """SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4)))
        |            AS DOUBLE) AS revenue,
        | COUNT(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q10_returned_value" ->
      """SELECT c_custkey, c_name, n_name,
        | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)))
        |      AS DOUBLE) AS revenue,
        | COUNT(*) AS n_items
        |FROM orders
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q_unpivot_measures" ->
      """WITH long AS (
        |  SELECT l_orderkey, 'quantity' AS measure, l_quantity AS val FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, 'price', l_extendedprice FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, 'discount', l_discount FROM lineitem)
        |SELECT measure, COUNT(*) AS n,
        |  CAST(SUM(CAST(val AS DECIMAL(18,4))) AS DOUBLE) AS total,
        |  ROUND(MIN(val), 4) AS min_val,
        |  ROUND(MAX(val), 4) AS max_val
        |FROM long GROUP BY measure ORDER BY measure""".stripMargin,

    "q_not_exists_late" ->
      """SELECT o_orderstatus, COUNT(*) AS n_orders, MIN(o_orderkey) AS min_ok
        |FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem l
        |                  WHERE l.l_orderkey = o.o_orderkey
        |                    AND l.l_shipdate <= o.o_orderdate + INTERVAL 30 DAY)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q4_priority_exists" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_window_funcs" ->
      """SELECT o_custkey, o_orderkey,
        | LAG(o_totalprice, 1) OVER w AS prev_price,
        | LEAD(o_totalprice, 1) OVER w AS next_price,
        | FIRST_VALUE(o_orderkey) OVER w AS first_ok,
        | CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
        | ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
        | ROUND(CUME_DIST() OVER w, 6) AS cum_dist
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_range_frame" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
        |   (PARTITION BY o_custkey ORDER BY o_orderkey
        |    RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |   AS nearby_spend
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_incremental_agg" ->
      """WITH o AS (
        |  SELECT o_orderstatus AS st, o_orderkey,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS p FROM orders),
        |b AS (SELECT st, COUNT(*) AS n, SUM(p) AS sp
        |      FROM o WHERE o_orderkey % 10 <> 7 GROUP BY st),
        |dl AS (SELECT st, COUNT(*) AS n, SUM(p) AS sp
        |       FROM o WHERE o_orderkey % 10 = 7 GROUP BY st),
        |m AS (SELECT st, CAST(SUM(n) AS BIGINT) AS n_merged,
        |        SUM(sp) AS sp_merged
        |      FROM (SELECT * FROM b UNION ALL SELECT * FROM dl)
        |      GROUP BY st),
        |f AS (SELECT st, COUNT(*) AS n_full, SUM(p) AS sp_full
        |      FROM o GROUP BY st)
        |SELECT m.st AS o_orderstatus,
        |  CAST(COALESCE(b.n, 0) AS BIGINT) AS n_base,
        |  CAST(m.n_merged - COALESCE(b.n, 0) AS BIGINT) AS n_delta,
        |  m.n_merged,
        |  CAST(m.sp_merged AS DOUBLE) AS total_merged,
        |  CAST(CASE WHEN m.n_merged = f.n_full AND m.sp_merged = f.sp_full
        |       THEN 1 ELSE 0 END AS BIGINT) AS consistent
        |FROM m JOIN f USING (st) LEFT JOIN b USING (st)
        |ORDER BY o_orderstatus""".stripMargin)
}
