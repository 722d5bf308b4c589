package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{AsOfJoin, RangeJoin, TimeAxis}
import graft.streaming.Streams

/** Time-encoding matrix (round-7 verdict ask #2): the driver's parquet `ts`
  * column has shipped as TIMESTAMP(NANOS) (→ long ns under the legacy
  * flag) and as timestamp[us] (→ TIMESTAMP_NTZ in Spark 4) across rounds,
  * and the round-7 regression was exactly an encoding flip the time-axis
  * lowerings didn't absorb. This spec pins the contract in both layers so
  * the class of break cannot recur silently:
  *
  *  1. LOADER: TimeAxis.normalize maps every encoding (ns-long, µs NTZ,
  *     µs LTZ) to the same session-zoned TIMESTAMP rows — so anything
  *     downstream of Tables.events / Streams.runAsStream sees one type.
  *  2. OPS: the type-driven lowerings accept a RAW timestamp axis in
  *     either zone flavor — AsOfJoin (tolerance path, both variants),
  *     RangeJoin bins, combineLatest, debounce, sessionAgg produce
  *     identical results on NTZ and LTZ inputs without pre-normalization.
  *
  * Raw ns-as-long is deliberately NOT pushed through the ops layer: a
  * 2024-epoch nanosecond count exceeds a double's 53-bit mantissa, so any
  * double-scale lowering of it is lossy — normalization to µs TIMESTAMP at
  * load is the supported path (layer 1), matching what every loader does.
  */
class TimeEncodingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private lazy val dirs: Map[String, String] = {
    val base = java.nio.file.Files
      .createTempDirectory("graft_ts_enc").toString
    val ev = Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type", "ts", "value")
      .filter(col("user_id") <= 10)
    ev.write.parquet(s"$base/ltz")
    ev.withColumn("ts", col("ts").cast(TimestampNTZType))
      .write.parquet(s"$base/ntz")
    ev.withColumn("ts", (unix_micros(col("ts")) * 1000L).as("ts"))
      .write.parquet(s"$base/nslong")
    Map("ltz" -> s"$base/ltz", "ntz" -> s"$base/ntz",
      "nslong" -> s"$base/nslong")
  }

  private def load(enc: String): DataFrame = spark.read.parquet(dirs(enc))

  test("parquet round-trip yields the three distinct encodings") {
    assert(load("ltz").schema("ts").dataType == TimestampType)
    assert(load("ntz").schema("ts").dataType == TimestampNTZType)
    assert(load("nslong").schema("ts").dataType == LongType)
  }

  test("TimeAxis.normalize: all three encodings land on identical TIMESTAMP rows") {
    val canon = TimeAxis.normalize(load("ltz"), "ts")
      .orderBy("event_id").collect()
    for (enc <- Seq("ntz", "nslong")) {
      val n = TimeAxis.normalize(load(enc), "ts")
      assert(n.schema("ts").dataType == TimestampType, s"enc=$enc")
      assert(n.orderBy("event_id").collect().sameElements(canon), s"enc=$enc")
    }
  }

  // --- layer 2: raw NTZ vs raw LTZ through every time-axis op ----------

  /** Run `op` on the same data in both raw zone flavors and assert equal
    * output; `lower` canonicalizes any time-typed output columns first
    * (NTZ and LTZ collect as different JVM classes for equal instants). */
  private def bothZones(op: DataFrame => DataFrame)(
      lower: DataFrame => DataFrame = identity): Unit = {
    val res = Seq("ltz", "ntz").map { enc =>
      enc -> lower(op(load(enc))).collect()
    }.toMap
    assert(res("ltz").nonEmpty, "op produced no rows — vacuous matrix cell")
    assert(res("ntz").sameElements(res("ltz")))
  }

  private def lowerTs(names: String*)(df: DataFrame): DataFrame =
    names.foldLeft(df)((d, n) =>
      d.withColumn(n, TimeAxis.micros(d.schema(n).dataType, col(n))))

  test("AsOfJoin.backward with tolerance: NTZ == LTZ") {
    bothZones { ev =>
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value").as("p_value"))
      AsOfJoin.backward(clicks, purchases, Seq("user_id"), "ts", "ts",
          toleranceSec = Some(48 * 3600.0))
        .orderBy(col("user_id"), col("event_id"))
    }(lowerTs("ts"))
  }

  test("AsOfJoin.backwardSmallRight with tolerance: NTZ == LTZ and == union+window plan") {
    def split(ev: DataFrame) = (
      ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id")),
      ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value").as("p_value")))
    bothZones { ev =>
      val (l, r) = split(ev)
      AsOfJoin.backwardSmallRight(l, r, Seq("user_id"), "ts", "ts",
          toleranceSec = Some(48 * 3600.0))
        .orderBy(col("user_id"), col("event_id"))
    }(lowerTs("ts"))
    // the two physical strategies agree on the NTZ axis too
    val (l, r) = split(load("ntz"))
    val a = AsOfJoin.backward(l, r, Seq("user_id"), "ts", "ts",
      toleranceSec = Some(48 * 3600.0)).orderBy("user_id", "event_id")
    val b = AsOfJoin.backwardSmallRight(l, r, Seq("user_id"), "ts", "ts",
      toleranceSec = Some(48 * 3600.0)).orderBy("user_id", "event_id")
    assert(lowerTs("ts")(a).collect()
      .sameElements(lowerTs("ts")(b).collect()))
  }

  test("RangeJoin.pointInInterval: NTZ == LTZ (mixed-zone interval side)") {
    // interval frame stays LTZ in both runs — the op must lower each
    // side's type individually (the exact round-7 failure shape had the
    // point side NTZ against timestamp-literal windows)
    val wins = spark.sql(
      """SELECT explode(sequence(timestamp'2024-01-01 00:00:00',
        |  timestamp'2024-01-30 00:00:00', interval 1 day)) AS lo""".stripMargin)
      .withColumn("hi", col("lo") + expr("INTERVAL 6 HOURS"))
    bothZones { ev =>
      RangeJoin.pointInInterval(ev.select(col("ts"), col("value")), "ts",
          wins, "lo", "hi", binWidth = 6 * 3600.0)
        .groupBy(to_date(col("lo")).as("day"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 3).as("v"))
        .orderBy(col("day"))
    }()
  }

  test("Streams.combineLatest: NTZ == LTZ") {
    bothZones { ev =>
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      Streams.combineLatest(clicks, purchases, "user_id", "ts")
        .toDF().orderBy(col("key"), col("ts"), col("side"))
    }()
  }

  test("Streams.debounce: NTZ == LTZ (quiet in axis seconds)") {
    bothZones { ev =>
      Streams.debounce(ev.filter(col("event_type") === "view"),
          "user_id", "ts", quiet = 3600.0, tieBreak = Seq("event_id"))
        .select(col("user_id"), col("event_id"))
        .orderBy(col("user_id"), col("event_id"))
    }()
  }

  test("Streams.sessionAgg: NTZ == LTZ") {
    bothZones { ev =>
      Streams.sessionAgg(ev, "30 minutes")
        .orderBy(col("user_id"), col("session_start"))
    }(lowerTs("session_start", "session_end"))
  }
}
