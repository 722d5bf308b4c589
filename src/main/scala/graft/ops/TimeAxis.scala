package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Type-driven lowering of a "time axis" column to a numeric epoch scale.
  *
  * The ops that bin, subtract, or compare a time axis (RangeJoin bins,
  * AsOfJoin tolerance, Streams.debounce/asofEnrich/combineLatest) accept
  * timestamps OR plain numerics. A bare `.cast("double")` handles
  * TIMESTAMP (→ epoch seconds) and numerics, but Spark 4 refuses it for
  * TIMESTAMP_NTZ (`DATATYPE_MISMATCH.CAST_WITHOUT_SUGGESTION`) — and the
  * driver testdata's parquet `timestamp[us]` loads as exactly that type.
  * Centralizing the lowering here makes every time-axis op robust to the
  * encoding instead of each call site hard-coding one.
  *
  * TIMESTAMP_NTZ is first cast to TIMESTAMP: with the session timezone
  * pinned to UTC (GraftSession) the cast is instant-preserving, so all
  * encodings of the same instant land on the same epoch number. All
  * lowerings are pure Column algebra — codegen-friendly, no UDF.
  */
object TimeAxis {

  /** Epoch SECONDS as double (fractional µs preserved): TIMESTAMP and
    * TIMESTAMP_NTZ → epoch seconds; numerics pass through as double
    * (caller-defined units, e.g. pre-lowered micros). */
  def seconds(dt: DataType, c: Column): Column = dt match {
    case TimestampType    => c.cast(DoubleType)
    case TimestampNTZType => c.cast(TimestampType).cast(DoubleType)
    case _: NumericType   => c.cast(DoubleType)
    case other => throw new IllegalArgumentException(
      s"TimeAxis: unsupported time-axis type $other (need timestamp, " +
        "timestamp_ntz, or numeric)")
  }

  /** Epoch MICROSECONDS as long (exact integers — the scale to use when
    * results cross engines, e.g. a DuckDB `epoch_us` oracle). Numerics are
    * taken as already-micros. */
  def micros(dt: DataType, c: Column): Column = dt match {
    case TimestampType    => unix_micros(c)
    case TimestampNTZType => unix_micros(c.cast(TimestampType))
    case _: NumericType   => c.cast(LongType)
    case other => throw new IllegalArgumentException(
      s"TimeAxis: unsupported time-axis type $other (need timestamp, " +
        "timestamp_ntz, or numeric)")
  }

  /** Schema-resolved variants (the common call shape at op boundaries). */
  def seconds(df: DataFrame, name: String): Column =
    seconds(df.schema(name).dataType, col(name))
  def micros(df: DataFrame, name: String): Column =
    micros(df.schema(name).dataType, col(name))

  /** Normalize a frame's time-axis column to session-zoned TIMESTAMP:
    * legacy nanos-as-long (integer µs division — see Tables.events for why
    * double division corrupts 2024-epoch nanos) and TIMESTAMP_NTZ both
    * become TimestampType; anything else passes through untouched. Used by
    * every events loader (batch and stream) so downstream window/session
    * operators see one canonical type regardless of parquet encoding. */
  def normalize(df: DataFrame, name: String = "ts"): DataFrame =
    df.schema(name).dataType match {
      case LongType =>
        df.withColumn(name, timestamp_micros(expr(s"$name DIV 1000")))
      case TimestampNTZType =>
        df.withColumn(name, col(name).cast(TimestampType))
      case _ => df
    }
}
