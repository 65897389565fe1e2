package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// disposable probe main (not part of the library): #121's union-agg
// snapshot diff (Graft.corpusDiff — one contraction exchange) vs the
// textbook FULL OUTER JOIN form (what the DuckDB oracle runs) as the
// corpus grows. Both are gated equal at the test SFs; this measures
// what the rewrite is worth on a synthetic N-doc corpus where the
// join's sorted-stream merge is corpus-scale.
// args: [N=50000000] [changedFrac=0.05]
object ProbeDiff {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 50000000L
    val changed = if (args.length > 1) args(1).toDouble else 0.05
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ~5% ids only in new (added), ~6% only in old (removed),
    // changedFrac of the intersection re-fingerprinted
    val ids = spark.range(n)
    val oldSnap = ids.where(pmod(xxhash64(col("id")), lit(20)) =!= 0)
      .select(col("id"), xxhash64(col("id"), lit(1)).as("fp"))
      .localCheckpoint(true)
    val newSnap = ids.where(pmod(xxhash64(col("id"), lit(3)), lit(17)) =!= 0)
      .select(col("id"),
        when(pmod(xxhash64(col("id"), lit(7)), lit(10000L)) <
          (changed * 10000).toLong, xxhash64(col("id"), lit(2)))
          .otherwise(xxhash64(col("id"), lit(1))).as("fp"))
      .localCheckpoint(true)
    println(s"N=$n changedFrac=$changed old=${oldSnap.count()} new=${newSnap.count()}")

    def unionAgg() = {
      val ua = oldSnap.select(col("id"), col("fp").as("_fp"), lit(0).as("_side"))
        .unionAll(newSnap.select(col("id"), col("fp").as("_fp"), lit(1).as("_side")))
      ua.groupBy("id")
        .agg(
          max(when(col("_side") === 0, lit(1))).as("_in_old"),
          max(when(col("_side") === 1, lit(1))).as("_in_new"),
          max(when(col("_side") === 0, col("_fp"))).as("fp_old"),
          max(when(col("_side") === 1, col("_fp"))).as("fp_new"))
        .select(when(col("_in_old").isNull, "added")
          .when(col("_in_new").isNull, "removed")
          .when(col("fp_old") <=> col("fp_new"), "unchanged")
          .otherwise("changed").as("status"))
        .groupBy("status").agg(count(lit(1)).as("docs"))
        .orderBy("status")
    }

    def fullJoin() = {
      val a = oldSnap.select(col("id").as("a_id"), col("fp").as("fp_old"))
      val b = newSnap.select(col("id").as("b_id"), col("fp").as("fp_new"))
      a.join(b, col("a_id") === col("b_id"), "full_outer")
        .select(when(col("a_id").isNull, "added")
          .when(col("b_id").isNull, "removed")
          .when(col("fp_old") <=> col("fp_new"), "unchanged")
          .otherwise("changed").as("status"))
        .groupBy("status").agg(count(lit(1)).as("docs"))
        .orderBy("status")
    }

    for (rep <- 1 to 4) {
      val t0 = System.nanoTime()
      val a = unionAgg().collect().map(r => s"${r.get(0)}=${r.get(1)}")
      val t1 = System.nanoTime()
      val b = fullJoin().collect().map(r => s"${r.get(0)}=${r.get(1)}")
      val t2 = System.nanoTime()
      require(a.sameElements(b), s"diverged: ${a.toSeq} vs ${b.toSeq}")
      println(f"rep$rep unionAgg=${(t1 - t0) / 1e9}%.2f s " +
        f"fullJoin=${(t2 - t1) / 1e9}%.2f s  [${a.mkString(" ")}]")
    }
    spark.stop()
  }
}
