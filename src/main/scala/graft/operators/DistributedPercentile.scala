package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructType}

/** EXACT grouped percentiles with linear interpolation — the semantics
  * of Spark's `percentile()` and DuckDB's `quantile_cont` — computed by
  * distributed selection instead of per-group value buffering.
  *
  * Spark's exact `percentile()` is a TypedImperativeAggregate whose
  * buffer holds EVERY value of the group; at 100 TB a hot group is
  * hundreds of billions of doubles in one executor's aggregation
  * buffer, which is the canonical OOM. `approx_percentile` is the
  * sketch answer when error is acceptable; this operator is the exact
  * answer when it isn't:
  *
  *  1. range-repartition the (group, value) pairs into `buckets`
  *     ordered ranges and materialize ONCE (the PrefixSum checkpoint
  *     pattern — boundaries are sampled, every consumer must see the
  *     same cut);
  *  2. per-(partition, group) counts → driver. O(partitions + groups)
  *     rows, NEVER O(rows) — same bounded-collect contract as the IVF
  *     centroid table: group cardinality must be driver-small, which
  *     matches the output (one row per group) being driver-small;
  *  3. the counts give each group's n, hence the exact 1-based ranks
  *     floor/ceil((n−1)·p)+1 each percentile needs, and each
  *     partition's per-group base offset;
  *  4. one partition-local sort + accumulator pass emits ONLY the rows
  *     whose global in-group rank is needed — ≤ 2·|ps| rows per group
  *     cross the wire;
  *  5. interpolation on the driver over O(groups × ps) selected rows,
  *     mirroring Percentile's weighted form
  *     (v_lo·(hi−pos) + v_hi·(pos−lo), lower value when lo == hi) so
  *     results are bit-identical to the built-in.
  *
  * NULL values are ignored (as `percentile()` does); a group with no
  * non-NULL values is absent from the output. The range-partition
  * checkpoint is released internally — callers need not release the
  * (tiny, driver-assembled) result.
  */
object DistributedPercentile {

  /** One output row per distinct `groupCol`: the exact `p` percentile
    * of `valueCol` for each (name, p) in `ps`, as a double column named
    * `name`.
    */
  def exact(df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[(String, Double)], buckets: Int = 32): DataFrame = {
    require(ps.nonEmpty, "need at least one percentile")
    require(ps.forall { case (_, p) => p >= 0.0 && p <= 1.0 },
      s"percentiles must be in [0,1]: $ps")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val spark = df.sparkSession

    val parted = df
      .select(col(groupCol).as("__g"),
        col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)
      .repartitionByRange(buckets, col("__g"), col("__v"))
      .withColumn("__part", spark_partition_id())
      .localCheckpoint()

    // O(partitions + groups) — each group spans few range partitions
    val sub = parted.groupBy(col("__part"), col("__g"))
      .agg(count(lit(1)).as("__n"))
      .collect()
      .map(r => (r.getInt(0), r.get(1), r.getLong(2)))

    val nByG: Map[Any, Long] =
      sub.groupBy(_._2).map { case (g, rs) => g -> rs.map(_._3).sum }
    // base offset of each (partition, group): counts of the same group
    // in range-earlier partitions (partition index increases with range)
    val offsets: Map[(Int, Any), Long] = sub.groupBy(_._2).flatMap {
      case (g, rs) =>
        val sorted = rs.sortBy(_._1)
        sorted.map(_._1).zip(
          sorted.map(_._3).scanLeft(0L)(_ + _).init)
          .map { case (part, off) => (part, g) -> off }
    }
    // 1-based ranks each group needs: floor/ceil of pos = (n−1)·p
    val needed: Map[Any, Set[Long]] = nByG.map { case (g, n) =>
      g -> ps.flatMap { case (_, p) =>
        val pos = (n - 1) * p
        Seq(math.floor(pos).toLong + 1, math.ceil(pos).toLong + 1)
      }.toSet
    }

    val gIdx = 0; val vIdx = 1; val pIdx = 2
    val midSchema = new StructType()
      .add(parted.schema.fields(gIdx).copy(name = "__g"))
      .add("__rank", LongType, nullable = false)
      .add("__v", DoubleType, nullable = false)
    val selected = parted
      .sortWithinPartitions(col("__g"), col("__v"))
      .mapPartitions { it =>
        var curG: Any = null
        var started = false
        var rank = 0L
        it.flatMap { r =>
          val g = r.get(gIdx)
          if (!started || g != curG) {
            curG = g; started = true
            rank = offsets.getOrElse((r.getInt(pIdx), g), 0L)
          }
          rank += 1
          if (needed.getOrElse(g, Set.empty).contains(rank))
            Some(Row(g, rank, r.getDouble(vIdx)))
          else None
        }
      }(Encoders.row(midSchema))
      .collect() // O(groups × ps) — proportional to the result
    graft.core.Checkpoints.release(parted)

    val byG = selected.groupBy(_.get(0))
    val out = byG.toSeq.map { case (g, rows) =>
      val vByRank = rows.map(r => r.getLong(1) -> r.getDouble(2)).toMap
      val n = nByG(g)
      val cells = ps.map { case (_, p) =>
        val pos = (n - 1) * p
        val lo = math.floor(pos).toLong
        val hi = math.ceil(pos).toLong
        if (lo == hi) vByRank(lo + 1)
        // Percentile's weighted form, NOT lo + frac·(hi−lo): the two
        // differ in the last ulp and the oracle hash is exact
        else vByRank(lo + 1) * (hi - pos) + vByRank(hi + 1) * (pos - lo)
      }
      Row.fromSeq(g +: cells)
    }
    val outSchema = ps.foldLeft(new StructType()
      .add(parted.schema.fields(gIdx).copy(name = groupCol))) {
      case (s, (name, _)) => s.add(name, DoubleType, nullable = false)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, 1), outSchema)
  }
}
