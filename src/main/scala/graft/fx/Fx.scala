package graft.fx

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.{Graph, Receipt, Transactor, Wish}

/** Effects system (SURVEY §2.13; reference `python/zef/core/fx/fx_types.py`):
  * pure effect DESCRIPTIONS (an ADT) executed by an interpreter — keeping
  * the reference's best property (effects as data, testable by inspection)
  * for the families that touch the engine: LocalFile, Graph, Stream.
  * Service families (HTTP/Websocket/UI/ZefHub auth) are non-goals per
  * SURVEY §7.5.
  */
sealed trait FX
object FX {
  // LocalFile family (fx/local_file.py)
  final case class LocalFileRead(path: String, format: String = "parquet") extends FX
  final case class LocalFileWrite(df: DataFrame, path: String,
      format: String = "parquet", mode: String = "overwrite") extends FX
  // Graph family (fx/graph.py)
  final case class GraphTransact(g: Graph, wishes: Seq[Wish]) extends FX
  final case class GraphTag(g: Graph, key: String, tag: String) extends FX
  // Stream family (fx/stream.py)
  final case class StreamStart(df: DataFrame, queryName: String,
      outputMode: String = "complete") extends FX
  final case class StreamStop(queryName: String) extends FX
}

/** The `run` op: interpret an effect. Pure values in, side effects out —
  * everything above this line is inspectable data. */
object FxRuntime {
  import FX._

  def run(spark: SparkSession, fx: FX): Any = fx match {
    case LocalFileRead(path, fmt) =>
      spark.read.format(fmt).load(path)
    case LocalFileWrite(df, path, fmt, mode) =>
      df.write.format(fmt).mode(mode).save(path); path
    case GraphTransact(g, wishes) =>
      Transactor.transact(g, wishes)
    case GraphTag(g, key, tag) =>
      Transactor.transact(g, Seq(graft.core.TagAtom(key, tag)))
    case StreamStart(df, name, mode) =>
      df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    case StreamStop(name) =>
      spark.streams.active.filter(_.name == name).foreach(_.stop()); name
  }
}
