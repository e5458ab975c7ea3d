package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine model TRAINING (north-star extension surface): the
  * quality-classifier training loop a corpus pipeline runs to distill
  * heuristic gates into learned models (the fastText-style weak
  * supervision pattern: label by rule, train a model that generalizes).
  * Inference-side counterparts already exist ([[Text.classifierScore]]
  * q118); this is the learning half, like [[Text.bpeTrain]] is for
  * [[Text.bpeEncode]].
  */
object Learn {

  /** Distributed batch perceptron over integer features — training as
    * a sequence of full-corpus aggregates, EXACT in 64-bit integer
    * arithmetic (no learning-rate float, no order-dependent sum):
    *
    * epoch t:  M = { i : yᵢ·(w·xᵢ) ≤ 0 }   (misclassified under wₜ₋₁)
    *           wₜ = wₜ₋₁ + Σ_{i∈M} yᵢ·xᵢ    (batch subgradient step)
    *
    * `features` must be integer-valued columns; `label` is a boolean
    * (true → y=+1). Returns one row per epoch:
    * `(epoch, w0…w(k−1), n_miss)` — weights AFTER the epoch's update,
    * `n_miss` measured BEFORE it (the quantity the step descends on).
    *
    * Scale shape (100 TB): the feature projection is computed ONCE
    * (one corpus scan, columns pruned to the feature inputs) and
    * `localCheckpoint`ed flat; each epoch is one map-side-combined
    * aggregate over it producing a SINGLE row (k gradient sums + a
    * miss count) — the same all-reduce shape a data-parallel SGD step
    * has, with the driver holding the k-weight model exactly like the
    * k-means IVF trainer (Similarity q38) holds centroids. Weights
    * enter each epoch's expressions as plan literals — broadcast by
    * construction, nothing driver-side ever exceeds k longs.
    *
    * Integer exactness: every product `yᵢ·wⱼ·xᵢⱼ` and every gradient
    * sum stays in BIGINT; with |x|≤2³¹ and corpus ≤2³² rows the sums
    * fit with headroom (weights grow at most by Σ|x| per epoch —
    * bounded by the perceptron mistake bound for separable data). Both
    * engines would overflow-error loudly, not wrap, past that.
    */
  def perceptron(df: DataFrame, features: Seq[Column], label: Column,
      epochs: Int): DataFrame = {
    require(features.nonEmpty, "features must be non-empty")
    require(epochs > 0, s"epochs must be positive: $epochs")
    val spark = df.sparkSession
    import org.apache.spark.sql.types._
    val k = features.size
    val proj = df.select(
      features.zipWithIndex.map { case (f, i) =>
        f.cast("long").as(s"x$i") } :+
        when(label, lit(1L)).otherwise(lit(-1L)).as("y"): _*)
      .localCheckpoint(true)
    // flat-stats rebuild (SPARK-39748): epochs rescan this table
    val feats = spark.createDataFrame(proj.rdd, proj.schema)
    var w = Array.fill(k)(0L)
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
    for (e <- 1 to epochs) {
      val margin = col("y") *
        (0 until k).map(i => lit(w(i)) * col(s"x$i")).reduce(_ + _)
      val missed = margin <= 0
      // coalesce: an EMPTY corpus (empty-partition run — fuzz gate)
      // sums to NULL, which must read as a zero gradient / zero
      // misses, not a null-destructure crash; the SQL twin coalesces
      // identically
      val aggs = (0 until k).map(i =>
        coalesce(sum(when(missed, col("y") * col(s"x$i"))
          .otherwise(lit(0L))), lit(0L)).as(s"g$i")) :+
        coalesce(sum(when(missed, lit(1L)).otherwise(lit(0L))), lit(0L))
          .as("miss")
      val r = feats.agg(aggs.head, aggs.tail: _*).collect()(0)
      w = Array.tabulate(k)(i => w(i) + r.getLong(i))
      out += (e.toLong +: w.toVector :+ r.getLong(k)).toArray
    }
    val schema = StructType(
      StructField("epoch", LongType, nullable = false) +:
        (0 until k).map(i =>
          StructField(s"w$i", LongType, nullable = false)) :+
        StructField("n_miss", LongType, nullable = false))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        out.toSeq.map(a =>
          org.apache.spark.sql.Row.fromSeq(a.toSeq)), 1), schema)
  }

  /** DuckDB twin of [[perceptron]]: the epoch loop unrolled as CTE
    * pairs — `__gN` (gradient sums + miss count under the previous
    * weights, cross-joined in as a 1-row CTE, not literals) and `__wN`
    * (the update). Like [[Text.bpeTrainSql]], the learned values are
    * data-dependent all the way down, so the hash match verifies the
    * training trajectory itself.
    */
  def perceptronSql(table: String, featE: Seq[String], labelE: String,
      epochs: Int): String = {
    require(featE.nonEmpty, "featE must be non-empty")
    require(epochs > 0, s"epochs must be positive: $epochs")
    val k = featE.size
    val idx = 0 until k
    val sb = new StringBuilder
    sb ++= s"""WITH __f AS MATERIALIZED (SELECT
       |  ${idx.map(i => s"CAST(${featE(i)} AS BIGINT) AS x$i")
            .mkString(",\n  ")},
       |  CASE WHEN $labelE THEN CAST(1 AS BIGINT)
       |    ELSE CAST(-1 AS BIGINT) END AS y
       |  FROM $table),
       |__w0 AS (SELECT ${idx.map(i =>
            s"CAST(0 AS BIGINT) AS w$i").mkString(", ")})""".stripMargin
    for (e <- 1 to epochs) {
      val dot = idx.map(i => s"w.w$i * x$i").mkString(" + ")
      sb ++= s""",
       |__g$e AS MATERIALIZED (SELECT
       |  ${idx.map(i => s"CAST(coalesce(sum(CASE WHEN y * ($dot) <= 0 " +
            s"THEN y * x$i ELSE 0 END), 0) AS BIGINT) AS g$i")
            .mkString(",\n  ")},
       |  CAST(coalesce(sum(CASE WHEN y * ($dot) <= 0 THEN 1 ELSE 0 END),
       |    0) AS BIGINT) AS miss
       |  FROM __f, __w${e - 1} w),
       |__w$e AS (SELECT ${idx.map(i =>
            s"w.w$i + g.g$i AS w$i").mkString(", ")}
       |  FROM __w${e - 1} w, __g$e g)""".stripMargin
    }
    val union = (1 to epochs).map(e =>
      s"SELECT CAST($e AS BIGINT) AS epoch, ${idx.map(i =>
        s"w.w$i").mkString(", ")}, g.miss AS n_miss " +
        s"FROM __w$e w, __g$e g")
      .mkString("\n", "\nUNION ALL\n", "")
    sb ++= s"\nSELECT * FROM ($union)\nORDER BY epoch"
    sb.toString
  }
}
