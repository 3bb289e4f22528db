package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine.{Catalog, Engine}
import scala.collection.mutable

/** Per-(session, dir) engine cache so the 40 correctness queries share one
  * catalog registration instead of re-reading table footers each call. */
object Engines {
  private val cache = mutable.Map.empty[(SparkSession, String), Engine]
  def get(s: SparkSession, dir: String): Engine = synchronized {
    cache.getOrElseUpdate((s, dir), Engine.forTestdata(s, dir))
  }
  /** Unpersist CTE caches of every live engine, plus every frame a
    * pipeline operator registered with [[graft.pipeline.PipelineCaches]]
    * — Verify/Bench call this after each query's action so caches don't
    * accumulate for the life of the session (ADVICE r2; VERDICT r11 #1:
    * the qp63 persist had no release path and taxed everything that ran
    * after it). */
  def releaseAll(blocking: Boolean = false): Unit = synchronized {
    cache.values.foreach(_.releaseCaches(blocking))
    graft.pipeline.PipelineCaches.releaseAll(blocking)
  }
}

/** The SURVEY §2 operator inventory, executed END-TO-END through the NutQL
  * front-end: text → Lexer → Parser → Binder → DataFrame. Each entry keeps
  * the round-1 DuckDB oracle SQL unchanged (single-sourced from
  * CoreQueries/CoreQueries2) — the correctness gate now proves the whole
  * engine path, not hand-built DataFrames.
  *
  * Since round 3 all 40 queries run through the engine: q12 uses the
  * `ASOF LEFT JOIN` grammar superset (reference ast/query.rs:100-111
  * defines AsOf in the AST but its parser never emits it) and the binder's
  * union + last-non-null lowering — the same scale-safe plan as the
  * round-1 DataFrame version.
  *
  * Determinism contract (same as round 1): float aggregates go through
  * toDecimal(x, 12, 2) = CAST(x AS DECIMAL(12,2)) on both sides, integer
  * casts via toInt64, final doubles via toFloat64.
  */
object EngineQueries {

  private val base: Map[String, QueryDef] =
    (CoreQueries.defs ++ CoreQueries2.defs).map(d => d.name -> d).toMap

  private def viaEngine(name: String, nutql: String): QueryDef =
    QueryDef(name, base(name).oracle,
      (s, dir) => Engines.get(s, dir).execute(nutql))

  val defs: Seq[QueryDef] = Seq(

    viaEngine("q01_agg_pricing", """
      select l_returnflag, l_linestatus,
        toFloat64(sum(toDecimal(l_quantity, 12, 2))) as sum_qty,
        toFloat64(sum(toDecimal(l_extendedprice, 12, 2))) as sum_base_price,
        toFloat64(sum(toDecimal(l_extendedprice, 12, 2) * toDecimal(1 - toDecimal(l_discount, 12, 2), 12, 2))) as sum_disc_price,
        toFloat64(sum(toDecimal(l_extendedprice, 12, 2) * toDecimal(1 - toDecimal(l_discount, 12, 2), 12, 2) * toDecimal(1 + toDecimal(l_tax, 12, 2), 12, 2))) as sum_charge,
        toFloat64(toFloat64(sum(toDecimal(l_quantity, 12, 2))) / count(*)) as avg_qty,
        toFloat64(toFloat64(sum(toDecimal(l_extendedprice, 12, 2))) / count(*)) as avg_price,
        toFloat64(toFloat64(sum(toDecimal(l_discount, 12, 2))) / count(*)) as avg_disc,
        count(*) as count_order
      from lineitem
      where l_shipdate <= toDateTime('1998-09-02 00:00:00')
      group by l_returnflag, l_linestatus
      order by l_returnflag, l_linestatus"""),

    viaEngine("q02_filter_topk", """
      select o_orderkey, o_custkey, o_totalprice
      from orders where o_orderstatus = 'O'
      order by o_totalprice desc, o_orderkey limit 100"""),

    viaEngine("q03_join_inner", """
      select l_orderkey,
        toFloat64(sum(toDecimal(l_extendedprice, 12, 2) * toDecimal(1 - toDecimal(l_discount, 12, 2), 12, 2))) as revenue,
        o_orderdate
      from lineitem
      join orders on l_orderkey = o_orderkey
      join customer on o_custkey = c_custkey
      where c_mktsegment = 'BUILDING'
      group by l_orderkey, o_orderdate
      order by revenue desc, l_orderkey limit 10"""),

    viaEngine("q04_exists_semi", """
      select o_orderpriority, count(*) as order_count
      from orders
      where exists (select 1 from lineitem where l_orderkey = o_orderkey and l_quantity > 48)
      group by o_orderpriority order by o_orderpriority"""),

    viaEngine("q05_join_left", """
      select c_custkey, c_name, count(o_orderkey) as order_cnt,
        toFloat64(sum(toDecimal(coalesce(o_totalprice, 0), 12, 2))) as total_spent
      from customer left join orders on c_custkey = o_custkey
      group by c_custkey, c_name
      order by c_custkey"""),

    viaEngine("q06_join_right", """
      select c_custkey, c_mktsegment, count(o_orderkey) as order_cnt
      from orders right join customer on o_custkey = c_custkey
      group by c_custkey, c_mktsegment
      order by c_custkey"""),

    viaEngine("q07_join_full", """
      with cn as (select c_nationkey as nk, count(*) as cust_cnt from customer group by c_nationkey),
           sn as (select s_nationkey as nk, count(*) as supp_cnt from supplier group by s_nationkey)
      select coalesce(cn.nk, sn.nk) as nationkey,
             coalesce(cust_cnt, 0) as cust_cnt, coalesce(supp_cnt, 0) as supp_cnt
      from cn full outer join sn on cn.nk = sn.nk
      order by nationkey"""),

    viaEngine("q08_join_left_semi", """
      select c_custkey, c_name from customer
      where c_custkey in (select o_custkey from orders where o_orderstatus = 'F')
      order by c_custkey"""),

    viaEngine("q09_join_left_anti", """
      select c_custkey, c_name, c_acctbal from customer
      where not exists (select 1 from orders
                        where o_custkey = c_custkey and o_totalprice > 250000)
      order by c_custkey"""),

    // RIGHT SEMI: rows of the right side having a match — swapped into
    // Spark's left_semi by the binder
    viaEngine("q10_join_right_semi", """
      select o_orderkey, o_orderstatus, o_totalprice
      from (select l_orderkey from lineitem where l_discount > 0.05) as l
      right semi join orders on l_orderkey = o_orderkey
      order by o_orderkey"""),

    viaEngine("q11_join_right_anti", """
      select c_custkey, c_name
      from (select o_custkey from orders where o_orderstatus = 'P') as o
      right anti join customer on o_custkey = c_custkey
      order by c_custkey"""),

    // ASOF LEFT JOIN through the engine text path: the binder lowers it to
    // the union + last-non-null window plan (linear, one shuffle on the
    // key) — the same scale-safe shape as the round-1 DataFrame lowering.
    viaEngine("q12_join_asof", """
      with b as (select user_id, ts, max(value) as v_value
                 from events where event_type = 'view' group by user_id, ts),
           a as (select event_id, user_id, ts, value
                 from events where event_type = 'click')
      select a.event_id, a.user_id, a.ts, a.value as click_value, b.v_value as asof_value
      from a asof left join b on a.user_id = b.user_id and a.ts >= b.ts
      order by a.event_id"""),

    viaEngine("q13_join_theta", """
      select c_nationkey as nationkey, count(*) as richer_pairs
      from customer join supplier
        on c_nationkey = s_nationkey and s_acctbal > c_acctbal
      group by c_nationkey order by nationkey"""),

    viaEngine("q14_multi_join", """
      select n_name,
        toFloat64(sum(toDecimal(l_extendedprice, 12, 2) * toDecimal(1 - toDecimal(l_discount, 12, 2), 12, 2))) as revenue
      from lineitem
      join orders on l_orderkey = o_orderkey
      join customer on o_custkey = c_custkey
      join supplier on l_suppkey = s_suppkey and c_nationkey = s_nationkey
      join nation on s_nationkey = n_nationkey
      join region on n_regionkey = r_regionkey
      group by n_name order by revenue desc, n_name"""),

    viaEngine("q15_cte_top_supplier", """
      with revenue as (
        select l_suppkey as supplier_no,
          toFloat64(sum(toDecimal(l_extendedprice, 12, 2) * toDecimal(1 - toDecimal(l_discount, 12, 2), 12, 2))) as total_revenue
        from lineitem group by l_suppkey)
      select s_suppkey, s_name, total_revenue
      from supplier join revenue on s_suppkey = supplier_no
      where total_revenue = (select max(total_revenue) from revenue)
      order by s_suppkey"""),

    viaEngine("q16_union_all", """
      select name from (
        select c_name as name from customer
        union all select s_name as name from supplier) as u
      order by name"""),

    viaEngine("q17_union_distinct", """
      select nk from (
        select c_nationkey as nk from customer
        union distinct select s_nationkey as nk from supplier) as u
      order by nk"""),

    viaEngine("q18_intersect", """
      select nk from (
        select c_nationkey as nk from customer where c_acctbal > 9000
        intersect select s_nationkey as nk from supplier) as u
      order by nk"""),

    viaEngine("q19_except", """
      select k from (
        select o_custkey as k from orders
        except select c_custkey as k from customer where c_acctbal > 0) as u
      order by k"""),

    viaEngine("q20_distinct", """
      select distinct l_returnflag, l_linestatus from lineitem
      order by l_returnflag, l_linestatus"""),

    // DISTINCT ON: ORDER BY does double duty (pick order within the key,
    // then output order), DuckDB semantics
    viaEngine("q21_distinct_on", """
      select distinct on (o_custkey) o_custkey, o_orderkey, o_orderdate, o_totalprice
      from orders
      order by o_custkey, o_orderdate desc, o_orderkey desc"""),

    viaEngine("q22_having", """
      select n_name, count(*) as cust_cnt,
        toFloat64(sum(toDecimal(c_acctbal, 12, 2))) as bal_sum
      from customer join nation on c_nationkey = n_nationkey
      group by n_name having count(*) > 30
      order by n_name"""),

    viaEngine("q23_limit_offset", """
      select o_orderkey, o_totalprice from orders
      order by o_orderkey limit 50 offset 100"""),

    viaEngine("q24_limit_with_ties", """
      select p_partkey, p_size from part
      order by p_size desc limit 10 with ties"""),

    viaEngine("q25_case_when", """
      select
        case o_orderstatus when 'O' then 'open' when 'F' then 'finished' else 'other' end as status_label,
        toInt64(sum(case when o_orderpriority = '1-URGENT' or o_orderpriority = '2-HIGH' then 1 else 0 end)) as high_cnt,
        toInt64(sum(case when o_orderpriority <> '1-URGENT' and o_orderpriority <> '2-HIGH' then 1 else 0 end)) as low_cnt,
        count(*) as total_cnt
      from orders group by status_label order by status_label"""),

    viaEngine("q26_scalar_subquery", """
      select o_orderkey, o_totalprice from orders
      where o_totalprice > 1.5 * (
        select toFloat64(toFloat64(sum(toDecimal(o_totalprice, 12, 2))) / count(*))
        from orders)
      order by o_orderkey"""),

    viaEngine("q27_in_list", """
      select o_orderpriority, count(*) as cnt from orders
      where o_orderpriority in ('1-URGENT', '2-HIGH')
      group by o_orderpriority order by o_orderpriority"""),

    viaEngine("q28_in_subquery", """
      select p_partkey, p_name from part
      where p_partkey in (select l_partkey from lineitem where l_quantity >= 49)
      order by p_partkey"""),

    viaEngine("q29_not_in_subquery", """
      select s_suppkey, s_name from supplier
      where s_nationkey not in (select c_nationkey from customer
                                where c_acctbal < 0 and c_nationkey < 7)
      order by s_suppkey"""),

    viaEngine("q30_between_like", """
      select p_partkey, p_name, p_type, p_retailprice from part
      where p_retailprice between 500 and 1000
        and (p_type like 'S%' or p_type ilike '%econ%')
      order by p_partkey"""),

    viaEngine("q31_bitops", """
      select p_partkey,
        toInt64(p_size & 15) as b_and,
        toInt64(p_size | 64) as b_or,
        toInt64(p_size ^ 5) as b_xor,
        toInt64(p_size << 2) as b_shl,
        toInt64(p_size >> 1) as b_shr,
        toInt64(~p_size) as b_not
      from part order by p_partkey"""),

    viaEngine("q32_strings", """
      select c_custkey,
        substring(c_name, 10, 9) as id_part,
        upper(c_mktsegment) as seg_up,
        lower(c_name) as name_lo,
        toInt64(length(c_name)) as name_len,
        c_name + '|' + c_mktsegment as tagged,
        replace(c_name, 'Customer#', 'C') as short_name
      from customer order by c_custkey"""),

    viaEngine("q33_dates", """
      select o_orderkey,
        toInt64(getYear(o_orderdate)) as yr,
        toInt64(getMonth(o_orderdate)) as mth,
        toInt64(toYYYYMMDD(o_orderdate)) as yyyymmdd,
        o_orderdate + interval 30 day as due_date,
        toInt64(dateDiff('day', o_orderdate, l_shipdate)) as ship_days
      from orders join lineitem on o_orderkey = l_orderkey
      where o_orderkey < 500 and l_linenumber = 1
      order by o_orderkey"""),

    viaEngine("q34_if_else", """
      select case when o_totalprice > 200000 then 'big'
                  when o_totalprice > 100000 then 'mid' else 'small' end as bucket,
        count(*) as cnt
      from orders group by bucket order by bucket"""),

    viaEngine("q35_is_null", """
      select c_mktsegment,
        toInt64(sum(case when o.o_custkey is null then 1 else 0 end)) as no_order_cnt,
        toInt64(sum(case when o.o_custkey is not null then 1 else 0 end)) as has_order_cnt
      from customer left join
        (select distinct o_custkey from orders) as o on c_custkey = o.o_custkey
      group by c_mktsegment order by c_mktsegment"""),

    viaEngine("q36_count_distinct", """
      select l_returnflag,
        countUnique(l_suppkey) as uniq_supp,
        countUnique(l_partkey) as uniq_part,
        count(*) as cnt
      from lineitem group by l_returnflag order by l_returnflag"""),

    viaEngine("q37_array_ops", """
      select vec_id, label,
        toFloat64(embedding[1]) as el1,
        toFloat64(embedding[64]) as el64,
        toInt64(arrayLength(embedding)) as dim
      from embeddings where vec_id < 200 order by vec_id"""),

    viaEngine("q38_group_by_expr", """
      select toInt64(getYear(o_orderdate)) as yr, count(*) as cnt,
        toFloat64(sum(toDecimal(o_totalprice, 12, 2))) as total
      from orders group by yr order by yr"""),

    viaEngine("q39_order_multi", """
      select l_orderkey, l_linenumber, l_returnflag, l_quantity from lineitem
      order by l_returnflag asc, l_quantity desc, l_orderkey asc, l_linenumber asc
      limit 100"""),

    viaEngine("q40_agg_minmax", """
      select c_mktsegment,
        min(c_acctbal) as min_bal, max(c_acctbal) as max_bal,
        toFloat64(toFloat64(sum(toDecimal(c_acctbal, 12, 2))) / count(*)) as avg_bal,
        min(c_name) as first_name, max(c_name) as last_name,
        count(*) as cnt
      from customer group by c_mktsegment order by c_mktsegment""")
  )
}
