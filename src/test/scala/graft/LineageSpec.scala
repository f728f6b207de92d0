package graft

import org.apache.spark.sql.functions._

import graft.plans.Lineage

/** Column-level lineage: output columns trace to the source columns
  * whose VALUES feed them (direct lineage — filters/join keys excluded). */
class LineageSpec extends SparkTestBase {

  test("aggregate + join lineage reaches the right source columns") {
    val li = Tables.lineitem(spark, sf0001)
    val ord = Tables.orders(spark, sf0001)
    val q = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .filter(col("o_totalprice") > 1000.0)
      .groupBy(col("o_orderpriority").as("prio"))
      .agg(sum(col("l_quantity") * (lit(1.0) - col("l_discount")))
        .as("net_qty"),
        count(lit(1)).as("n"))
    val lin = Lineage.columnLineage(q)
    assert(lin("prio") === Seq("orders.o_orderpriority"))
    assert(lin("net_qty") ===
      Seq("lineitem.l_discount", "lineitem.l_quantity"))
    // count(1) has no source ancestry; the filter's o_totalprice must
    // NOT leak into any output's lineage (direct lineage only)
    assert(lin("n") === Seq.empty)
    assert(!lin.values.flatten.toSet.contains("orders.o_totalprice"))
  }

  test("multi-hop aliases and exploded columns trace through") {
    val q = Tables.documents(spark, sf0001)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .select(col("doc_id").as("id"), length(col("tok")).as("tok_len"))
    val lin = Lineage.columnLineage(q)
    assert(lin("id") === Seq("documents.doc_id"))
    assert(lin("tok_len") === Seq("documents.text"))
  }

  test("window functions and unions merge lineage across branches") {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, sf0001)
    val w = Window.partitionBy("user_id").orderBy("ts")
    val ranked = ev.select(col("event_id"),
      row_number().over(w).as("rn"))
    val lin = Lineage.columnLineage(ranked)
    assert(lin("rn") === Seq("events.ts", "events.user_id"))

    val u = Tables.customer(spark, sf0001)
      .select(col("c_name").as("name"))
      .unionByName(Tables.supplier(spark, sf0001)
        .select(col("s_name").as("name")))
    val ulin = Lineage.columnLineage(u)
    assert(ulin("name").toSet ===
      Set("customer.c_name", "supplier.s_name"))
  }
}
