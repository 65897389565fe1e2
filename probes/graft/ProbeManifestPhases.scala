package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
// disposable: r22 — phase timing of q_training_manifest (2.3-3.3 s at
// sf0.1): funnel flags scan, keeper/label joins, pack window + mix fit.
object ProbeManifestPhases {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      })
    def t[A](tag: String)(body: => A): A = {
      val j0 = jobs.get(); val t0 = System.nanoTime(); val r = body
      println(f"[phase] $tag: ${(System.nanoTime() - t0) / 1e9}%.3f s, jobs=${jobs.get() - j0}")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    t("warmup full manifest") {
      noop(SparkEntry.queries("q_training_manifest")(spark, dir))
    }
    (1 to 2).foreach { rep =>
      println(s"=== rep $rep ===")
      spark.catalog.clearCache()
      t("full q_training_manifest") {
        noop(SparkEntry.queries("q_training_manifest")(spark, dir))
      }
      spark.catalog.clearCache()
      t("funnel flags (q_curation_verdicts shape)") {
        noop(SparkEntry.queries("q_curation_verdicts")(spark, dir))
      }
      t("labels q_dup_clusters (memoized)") {
        noop(SparkEntry.queries("q_dup_clusters")(spark, dir))
      }
      t("keepers q_keeper_quality") {
        noop(SparkEntry.queries("q_keeper_quality")(spark, dir))
      }
    }
    spark.stop()
  }
}
