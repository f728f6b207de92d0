package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed global prefix sum — a running total over a TOTAL ordering
  * of the whole dataset.
  *
  * The naive form, `sum(v).over(Window.orderBy(keys…))`, plans as a
  * SINGLE-partition window: Spark funnels every row through one task to
  * honor the global ordering (it even warns `No Partition Defined for
  * Window operation`). Fine for q48-style inputs that were collapsed to a
  * bounded row count first; a scale cliff when the running total ranges
  * over the corpus itself (token-budget corpus selection, global quota
  * cuts, ranked exports).
  *
  * This is the classic two-phase formulation instead:
  *
  *   1. `repartitionByRange` on the ordering — partition i holds rows
  *      strictly before partition i+1, so `spark_partition_id()` IS the
  *      global order of the slices;
  *   2. a per-partition running sum (window partitioned by that id —
  *      each window group is one slice, state bounded by slice size);
  *   3. each slice's EXCLUSIVE offset (total of all earlier slices) from
  *      a ≤ numPartitions-row aggregate, shipped back as a broadcast
  *      join — the only driver traffic is one row per partition.
  *
  * The ordering must be TOTAL (pass a unique tiebreaker last): range
  * partitioning may split equal keys across boundaries, and within-slice
  * tie order would otherwise be nondeterministic. Correctness does not
  * depend on where the sampled range boundaries fall — only on the
  * ordering they respect.
  */
object PrefixSum {

  /** Append `out` = running sum of `value` over the total ordering
    * `order` (first key most significant). `numPartitions` defaults to
    * `spark.sql.shuffle.partitions`. */
  def withRunningTotal(df: DataFrame, value: Column, order: Seq[Column],
      out: String, numPartitions: Int = 0): DataFrame = {
    require(order.nonEmpty, "PrefixSum: ordering must be non-empty")
    // slice offsets must be EXACT — a wrong offset corrupts the running
    // total of every row in every later slice. Integral and decimal
    // values sum exactly (the driver accumulation below is BigDecimal);
    // float/double running totals are inherently order-dependent AND a
    // silent long-cast would truncate fractions, so they are a named
    // error: cast to a decimal of the precision you actually want first.
    df.select(value.as("__v")).schema.head.dataType match {
      case ByteType | ShortType | IntegerType | LongType
           | _: DecimalType => ()
      case other => throw new IllegalArgumentException(
        s"PrefixSum: value must be an integral or decimal column for " +
          s"exact slice offsets; got $other — cast to decimal first")
    }
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val ranged = df
      .repartitionByRange(n, order: _*)
      .withColumn("__slice", spark_partition_id())
    val w = Window.partitionBy("__slice").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // MATERIALIZE the sliced running sums once: the offsets collect and
    // the final join are separate actions, and repartitionByRange's
    // boundary SAMPLING is seeded by the (per-action) RDD id — without a
    // cut, the two jobs could slice the data differently and the offsets
    // would not belong to the slices they are added to. (Invisible at
    // test scale, where the sample covers the input and boundaries are
    // exact quantiles either way.) One materialization is the price of a
    // consistent slicing; both consumers below read it.
    val local = ranged.withColumn("__local", sum(value).over(w))
      .localCheckpoint(eager = true)
    // one row per slice; exclusive offsets computed on the driver over a
    // bounded (≤ n) collect, then broadcast back. Accumulation is
    // BigDecimal (exact for both long and decimal slice totals); the
    // offset column is cast back to the sum's own type before the add so
    // `out` keeps exactly the type sum(value) would have.
    val grouped = local.groupBy("__slice").agg(sum(value).as("__t"))
    val sumType = grouped.schema("__t").dataType
    val totals = grouped
      .collect()
      .map { r =>
        val t =
          if (r.isNullAt(1)) BigDecimal(0)
          else r.get(1) match {
            case l: java.lang.Long => BigDecimal(l)
            case d: java.math.BigDecimal => BigDecimal(d)
            case o => throw new IllegalStateException(
              s"PrefixSum: unexpected slice-total type ${o.getClass}")
          }
        (r.getInt(0), t)
      }
      .sortBy(_._1)
    var acc = BigDecimal(0)
    val offsets = totals.map { case (slice, t) =>
      val o = (slice, acc); acc += t; o
    }
    val offDf = spark.createDataFrame(offsets.toSeq)
      .toDF("__slice", "__off")
    local
      .join(broadcast(offDf), Seq("__slice"), "left")
      .withColumn(out, (col("__local") +
        coalesce(col("__off").cast(sumType), lit(0).cast(sumType)))
        .cast(sumType))
      .drop("__slice", "__local", "__off")
  }
}
