package graft.tools
import graft._
import graft.core._
import graft.fx._
import org.apache.spark.sql.functions._
object IngestProbe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    def time(lbl: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[ingest-probe] $lbl ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    val base = "/tmp/graft_ingest_probe"
    val root = java.nio.file.Paths.get(base)
    if (java.nio.file.Files.exists(root)) {
      java.nio.file.Files.walk(root).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
    val ev = Tables.events(spark, sf)
    time("src prep")(ev.repartition(4, col("event_id")).write.parquet(s"$base/src"))
    time("publish")(Sync.publish(Graph.empty(spark), s"$base/store"))
    var handle = Sync.open(spark, s"$base/store")
    val files = new java.io.File(s"$base/src").listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    val rts = Seq("Value", "EventType")
    files.zipWithIndex.foreach { case (f, i) =>
      val batch = spark.read.parquet(f.getPath)
      time(s"batch$i total") {
        val packed = batch.select(
          GraphEncoder.entityId("User", col("user_id")).as("owner_id"),
          col("ts").as("__ts"), col("event_id").cast("long").as("__tie"),
          struct(col("ts").as("__wts"), col("event_id").cast("long").as("__wtie"),
            col("value").as("Value"), col("event_type").as("EventType")).as("__p"))
        val winners = packed.groupBy(col("owner_id"))
          .agg(max_by(col("__p"), struct(col("__ts"), col("__tie"))).as("__w"))
          .select(col("owner_id"), col("__w.__wts").as("__ts"),
            col("__w.__wtie").as("__tie"),
            col("__w.Value").as("Value"), col("__w.EventType").as("EventType"))
        val g = handle.graph
        var lv: org.apache.spark.sql.DataFrame = null
        time(s"batch$i latestValues") { lv = g.latestValues(g.maxSlice) }
        def hw(rt: String, vcol: String, as: String) =
          lv.filter(col("ae_id").startsWith(s"ae:$rt/"))
            .select(col("ae_id").substr(lit(s"ae:$rt/".length + 1),
              lit(Int.MaxValue)).as("owner_id"), col(vcol).as(as))
        val fresh = winners
          .join(hw("_ingest_ts", "v_ts", "__sts"), Seq("owner_id"), "left")
          .join(hw("_ingest_tie", "v_long", "__stie"), Seq("owner_id"), "left")
          .filter(col("__sts").isNull || col("__ts") > col("__sts") ||
            (col("__ts") === col("__sts") && col("__tie") > col("__stie")))
        var assignments: org.apache.spark.sql.DataFrame = null
        time(s"batch$i winners+fresh ckpt") {
          assignments = fresh.select(col("owner_id"), col("Value"),
            col("EventType"), col("__ts").as("_ingest_ts"),
            col("__tie").as("_ingest_tie")).localCheckpoint(true)
        }
        val stat = assignments.agg(count(lit(1)), max(col("_ingest_ts"))).collect()(0)
        if (stat.getLong(0) > 0L) {
          val txTs = stat.getTimestamp(1)
          Sync.claimSlice(s"$base/store", g.maxSlice + 1)
          var pair: (Graph, Transactor.BulkDelta) = null
          time(s"batch$i bulkDelta") {
            pair = Transactor.assignFieldsBulkDelta(g, assignments,
              rts.map(rt => Transactor.BulkField(rt,
                if (rt == "Value") "double" else "str")) ++
                Seq(Transactor.BulkField("_ingest_ts", "ts"),
                  Transactor.BulkField("_ingest_tie", "long")),
              ts = txTs, ensureOwnerType = Some("User"), materializeDelta = true)
          }
          time(s"batch$i appendBulk")(
            GraphStore.appendBulk(spark, s"$base/store", pair._2))
          handle = handle.copy(graph = pair._1)
        }
      }
    }
    time("final read") {
      val g = Sync.open(spark, s"$base/store").graph
      g.now.all("User").fieldValue("Value", "v_double", "value")
        .join(g.now.all("User").fieldValue("EventType", "v_str", "event_type"),
          "atom_id")
        .orderBy(col("atom_id")).count()
    }
    spark.stop()
  }
}
