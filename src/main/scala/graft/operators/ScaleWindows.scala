package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Partition-less ("global") window forms, ROUTED on row count — the
  * q276 curriculum-ntile recipe (LmScore.globalNtileStages) generalized
  * to the two shapes the rest of the registry uses: a global
  * `row_number()` and global running `sum()`s over a total order.
  *
  * Below [[GlobalWindowCap]] rows the plain window runs — exact, the
  * oracle-replayable form, and the plan every gate pins at fixture
  * scale. Above it a partition-less window would serialize the whole
  * frame through ONE task (Spark's WindowExec warns exactly this); the
  * routed form instead range-partitions with a distributed `orderBy`,
  * collects one (count, Σ per sum column) tuple per partition — longs,
  * not rows — and assigns each row rank = partition offset + local
  * position and running sum = partition prefix + local prefix.
  * Value-identical to the window by construction WHEN the order columns
  * form a unique key (ties don't exist, so range-boundary placement
  * cannot reorder equal rows — the same precondition
  * globalNtileStages documents). The localCheckpoint pins the sorted
  * blocks so the stats pass and the emit pass read the same layout.
  *
  * Routing cost: a caller that already knows the row count passes it
  * via `knownCount` and the below-cap path adds ZERO jobs (the plain
  * window is built lazily — EngineSpec pins this with a job-group
  * audit). Without it the input is localCheckpointed FIRST and the
  * count reads the cached blocks, so the upstream plan executes once
  * total instead of once for the count and again for the window (the
  * round-14 advice: TextStats' cumulative call re-executed its
  * dr/gt/vo join solely for the routing count).
  */
object ScaleWindows {

  /** Same magnitude as LmScore.CurriculumWindowCap: ~2M rows × ~100 B
    * through one window task ≈ 200 MB single-threaded — past it the
    * two-pass distributed form's extra scan is cheaper than the funnel. */
  val GlobalWindowCap = 2000000L

  /** Append to `df`: `rankCol` = row_number() OVER (ORDER BY order), and
    * for each (valCol, outCol) in `sums` the running
    * SUM(valCol) OVER (ORDER BY order ROWS UNBOUNDED PRECEDING) — all
    * LongType. `order` must be a unique key of `df`; sum columns must be
    * LongType (null counts as 0, matching window sum's null-skip). */
  def globalOrderedScan(df: DataFrame, order: Seq[Column],
      rankCol: Option[String], sums: Seq[(String, String)] = Nil,
      cap: Long = GlobalWindowCap,
      knownCount: Option[Long] = None): DataFrame = {
    val (src, n) = knownCount match {
      case Some(k) => (df, k)
      case None =>
        val c = df.localCheckpoint(true)
        (c, c.count())
    }
    if (n <= cap) {
      val w = Window.orderBy(order: _*)
      val ranked = rankCol.fold(src)(rc =>
        src.withColumn(rc, row_number().over(w).cast("long")))
      sums.foldLeft(ranked) { case (acc, (vc, oc)) =>
        acc.withColumn(oc, sum(col(vc))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long"))
      }
    } else {
      val spark = src.sparkSession
      val sorted = src.orderBy(order: _*).localCheckpoint(true)
      val sumIdx = sums.map { case (vc, _) => sorted.schema.fieldIndex(vc) }
      // one (count, Σ…, non-null count…) tuple per partition — the only
      // driver traffic (non-null counts carry the window sum's
      // null-until-first-value semantics across partition boundaries)
      val partStats = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
        var cnt = 0L
        val s = Array.fill(sumIdx.length)(0L)
        val nn = Array.fill(sumIdx.length)(0L)
        it.foreach { r =>
          cnt += 1
          var j = 0
          while (j < sumIdx.length) {
            if (!r.isNullAt(sumIdx(j))) {
              s(j) += r.getLong(sumIdx(j)); nn(j) += 1
            }
            j += 1
          }
        }
        Iterator((i, cnt, s, nn))
      }.collect().sortBy(_._1)
      val cntOff = partStats.map(_._2).scanLeft(0L)(_ + _)
      val sumOff = Array.tabulate(sumIdx.length)(j =>
        partStats.map(_._3(j)).scanLeft(0L)(_ + _))
      val nnOff = Array.tabulate(sumIdx.length)(j =>
        partStats.map(_._4(j)).scanLeft(0L)(_ + _))
      val schema = StructType(sorted.schema.fields ++
        rankCol.map(rc => StructField(rc, LongType, nullable = false)).toSeq ++
        sums.map { case (_, oc) => StructField(oc, LongType, nullable = true) })
      val cntB = spark.sparkContext.broadcast(cntOff)
      val sumB = spark.sparkContext.broadcast(sumOff)
      val nnB = spark.sparkContext.broadcast(nnOff)
      val hasRank = rankCol.isDefined
      val out = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
        var rank = cntB.value(i)
        val run = Array.tabulate(sumIdx.length)(j => sumB.value(j)(i))
        // window sum is NULL until the first non-null value in the order
        val seen = Array.tabulate(sumIdx.length)(j => nnB.value(j)(i) > 0)
        it.map { r =>
          rank += 1
          var j = 0
          while (j < sumIdx.length) {
            if (!r.isNullAt(sumIdx(j))) {
              run(j) += r.getLong(sumIdx(j)); seen(j) = true
            }
            j += 1
          }
          Row.fromSeq(r.toSeq ++
            (if (hasRank) Seq(rank) else Nil) ++
            sumIdx.indices.map(j => if (seen(j)) run(j) else null))
        }
      }
      spark.createDataFrame(out, schema)
    }
  }
}
