package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
// disposable: r22 — VERDICT item 6: prove each certification twin's
// expensive staging pass (shingle/fingerprint store) is ONE shared
// cache feeding both the truth and pipeline branches, not recomputed
// per branch. Counts DISTINCT InMemoryRelation cache builders (by
// reference identity) in the executed plan and reports how many scans
// read each — N scans over 1 builder = shared; 2 builders with the
// same shape = re-shingled twice.
object ProbeTwinStaging {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("q_dedup_minhash_lsh", "q_dedup_winnow", "q_dedup_containment_capped",
      "q_dedup_ngram_jaccard_capped").foreach { q =>
      spark.catalog.clearCache()
      val df = SparkEntry.queries(q)(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      def leaves(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[InMemoryTableScanExec] = p match {
        case a: AdaptiveSparkPlanExec => leaves(a.executedPlan)
        case i: InMemoryTableScanExec => Seq(i)
        case other => other.children.flatMap(leaves) ++
          other.subqueries.flatMap(leaves)
      }
      // walk INTO cached plans too: a cache built over another cache
      // still counts its parent builder once
      val seen = scala.collection.mutable.LinkedHashMap
        .empty[AnyRef, (Int, String)]
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit =
        leaves(p).foreach { s =>
          val key = s.relation.cacheBuilder
          val tag = s.relation.cachedPlan.toString.linesIterator
            .take(1).mkString.take(90)
          seen.updateWith(key) {
            case Some((n, t)) => Some((n + 1, t)); case None => Some((1, tag))
          }
          walk(s.relation.cachedPlan)
        }
      walk(df.queryExecution.executedPlan)
      println(s"== $q: ${seen.size} distinct cache(s)")
      seen.values.foreach { case (n, tag) =>
        println(f"   scans=$n%2d  root: $tag")
      }
    }
    spark.stop()
  }
}
