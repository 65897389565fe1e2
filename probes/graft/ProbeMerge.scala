package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// disposable probe main (not part of the library): incremental cluster
// maintenance (#69, Graft.mergeComponents) vs full re-cluster. The
// corpus's near-dup graphs are tiny (hundreds of edges — clustering is
// overhead-bound there), so the probe synthesizes the graph SHAPE the
// operator exists for: a base graph far larger than the ingest batch.
// Base: V vertices in stars of 8 (v → v - v%8). Batch: B new vertices,
// each attaching to a deterministic existing vertex.
// args: [V=2000000] [B=20000]
object ProbeMerge {
  def main(args: Array[String]): Unit = {
    val v = if (args.length > 0) args(0).toLong else 2000000L
    val batch = if (args.length > 1) args(1).toLong else 20000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.range(v).where(pmod(col("id"), lit(8)) =!= 0)
      .select(col("id").as("src"),
        (col("id") - pmod(col("id"), lit(8))).as("dst"))
      .localCheckpoint(true)
    val inc = spark.range(v, v + batch)
      .select(col("id").as("src"),
        pmod(xxhash64(col("id")), lit(v)).as("dst"))
      .localCheckpoint(true)
    val union = base.unionByName(inc).localCheckpoint(true)
    // prior state (what a real pipeline has stored; excluded from the
    // maintenance timing)
    val baseLabels = graft.api.Graft
      .connectedComponents(base, "src", "dst")
      .localCheckpoint(true)
    println(s"V=$v baseEdges=${base.count()} batchEdges=${inc.count()}")
    for (rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val m = graft.api.Graft.mergeComponents(baseLabels, inc, "src", "dst")
        .count()
      val t1 = System.nanoTime()
      val f = graft.api.Graft.connectedComponents(union, "src", "dst")
        .count()
      val t2 = System.nanoTime()
      println(f"rep$rep merge=${(t1 - t0) / 1e9}%.2f s ($m rows) " +
        f"fullCC=${(t2 - t1) / 1e9}%.2f s ($f rows)")
    }
    spark.stop()
  }
}
