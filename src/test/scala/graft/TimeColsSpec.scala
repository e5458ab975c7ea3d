package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.TimeCols
import graft.ops.{AsOfJoin, RangeJoin, Sessionize}

/** The shared timestamp→integer coercion must accept BOTH timestamp
  * flavors (the round-8 testdata regeneration shipped TIMESTAMP_NTZ where
  * TIMESTAMP had been) and reject everything else by name. The
  * time-keyed operators are exercised over an NTZ frame end-to-end —
  * exactly the drift that broke q41/q44/q85/q116 — and must produce the
  * SAME rows as over the equivalent TIMESTAMP frame.
  */
class TimeColsSpec extends SparkSuite {
  import spark.implicits._

  // (user, id, wall-clock second, label) — session gap of 60s splits 3/1
  private val raw = Seq(
    (1L, 1L, 0L, "a"), (1L, 2L, 10L, "b"), (1L, 3L, 30L, "c"),
    (1L, 4L, 300L, "d"), (2L, 5L, 5L, "e"))

  private def tzFrame = raw.toDF("u", "id", "sec", "lbl")
    .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
  private def ntzFrame = tzFrame
    .withColumn("ts", col("ts").cast(TimestampNTZType))

  test("toMicros agrees across TIMESTAMP and TIMESTAMP_NTZ under UTC") {
    val tz = tzFrame.select(
      TimeCols.toMicros(TimestampType, col("ts")).as("us"))
      .as[Long].collect().sorted
    val ntz = ntzFrame.select(
      TimeCols.toMicros(TimestampNTZType, col("ts")).as("us"))
      .as[Long].collect().sorted
    assert(tz.sameElements(ntz))
    assert(tz.head == 0L && tz.last == 300000000L)
  }

  test("toMicros / toSliceLong reject non-time columns by name") {
    val e1 = intercept[IllegalArgumentException] {
      TimeCols.toMicros(LongType, col("x"))
    }
    assert(e1.getMessage.contains("BIGINT"))
    val e2 = intercept[IllegalArgumentException] {
      TimeCols.toSliceLong(StringType, col("x"))
    }
    assert(e2.getMessage.contains("STRING"))
  }

  test("sessionize produces identical sessions over an NTZ frame") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Sessionize.summary(df, "u", "ts", "id", gapSec = 60)
        .select("u", "session_idx", "n_events", "duration_us")
        .orderBy("u", "session_idx")
        .as[(Long, Long, Long, Long)].collect().toSeq
    val expected = Seq((1L, 1L, 3L, 30000000L), (1L, 2L, 1L, 0L),
      (2L, 1L, 1L, 0L))
    assert(run(tzFrame) == expected)
    assert(run(ntzFrame) == expected)
  }

  test("episodes over NTZ matches TZ") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Sessionize.episodes(df, "u", "ts", "id", "lbl", gapSec = 60)
        .orderBy("u", "session_idx")
        .select("episode").as[String].collect().toSeq
    assert(run(ntzFrame) == run(tzFrame))
    assert(run(ntzFrame) == Seq("a,b,c", "d", "e"))
  }

  test("range join over NTZ point and interval times matches TZ") {
    def intervals(ntz: Boolean) = {
      val base = Seq((1L, 0L, 20L, "early"), (1L, 25L, 400L, "late"))
        .toDF("u", "s", "e", "tag")
        .withColumn("t_start", timestamp_seconds(col("s")))
        .withColumn("t_end", timestamp_seconds(col("e")))
        .drop("s", "e")
      if (ntz) base
        .withColumn("t_start", col("t_start").cast(TimestampNTZType))
        .withColumn("t_end", col("t_end").cast(TimestampNTZType))
      else base
    }
    def run(points: org.apache.spark.sql.DataFrame, ntz: Boolean) =
      RangeJoin.pointInInterval(points.select("u", "id", "ts"),
          intervals(ntz), "u", "ts", "t_start", "t_end",
          bucketMicros = 60000000L)
        .select("id", "tag").orderBy("id", "tag")
        .as[(Long, String)].collect().toSeq
    val expected = Seq((1L, "early"), (2L, "early"), (3L, "late"),
      (4L, "late"))
    assert(run(tzFrame, ntz = false) == expected)
    assert(run(ntzFrame, ntz = true) == expected)
  }

  test("sliced as-of join over NTZ matches plain as-of over TZ") {
    val left = tzFrame.select(col("u"), col("id"), col("ts"))
    val right = Seq((1L, 2L, 100L), (1L, 280L, 777L), (2L, 1L, 5L))
      .toDF("u", "rsec", "quote")
      .withColumn("rt", timestamp_seconds(col("rsec"))).drop("rsec")
    val plain = AsOfJoin.asOf(left, right, "u", "ts", "rt")
      .select("id", "quote").orderBy("id")
      .as[(Long, Option[Long])].collect().toSeq
    val sliced = AsOfJoin.asOfSliced(
        left.withColumn("ts", col("ts").cast(TimestampNTZType)),
        right.withColumn("rt", col("rt").cast(TimestampNTZType)),
        "u", "ts", "rt", sliceSeconds = 30)
      .select("id", "quote").orderBy("id")
      .as[(Long, Option[Long])].collect().toSeq
    assert(sliced == plain)
    assert(plain == Seq((1L, None), (2L, Some(100L)), (3L, Some(100L)),
      (4L, Some(777L)), (5L, Some(5L))))
  }
}
