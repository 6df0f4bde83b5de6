package graft.pipeline

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** CLI drive of the A2–A15 ingest dataflow over a throwaway fixture:
  * run 1 loads the latest .zip artifact, run 2 is a seen-set no-op, a new
  * artifact triggers run 3 — the reference's daily loop, three ticks. */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = Files.createTempDirectory("graft-demo-manifest").toString
    Seq("snap_2024-01-01.zip", "snap_2024-01-03.zip", "readme.txt")
      .foreach(n => Files.write(Paths.get(dir, n), "x".getBytes))
    val state = Files.createTempDirectory("graft-demo-state").toString + "/state"
    val sink = new SnapshotSink {
      def load(s: SparkSession, name: String): Unit =
        println(s"[pipeline-demo] LOAD $name")
    }
    val p = new IngestPipeline(PipelineConfig(dir, state), sink)
    println(s"[pipeline-demo] run1 -> ${p.run(spark)}")
    println(s"[pipeline-demo] run2 -> ${p.run(spark)}")
    Files.write(Paths.get(dir, "snap_2024-01-05.zip"), "y".getBytes)
    println(s"[pipeline-demo] run3 -> ${p.run(spark)}")
    // A8–A10: a real zip lands, entries explode executor-side, and the
    // .bak inside is picked by deterministic max (not the reference's
    // iteration-order last-wins)
    val zipDir = Files.createTempDirectory("graft-demo-zip").toString
    val zout = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(s"$zipDir/snap.zip"))
    Seq("db_2024-01-02.bak", "db_2024-01-07.bak", "notes.txt").foreach { e =>
      zout.putNextEntry(new java.util.zip.ZipEntry(e))
      zout.write("payload".getBytes); zout.closeEntry()
    }
    zout.close()
    val picked = graft.sources.ZipArchives
      .latestEntryMatching(spark, zipDir, ".bak").collect()(0)
    println(s"[pipeline-demo] extract-pick -> ${picked.getAs[String]("entry")}")
    spark.stop()
  }
}
