package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// disposable probe main (not part of the library): the semantic-dedup
// cell-count dial. Within-cell pair work is k·(n/k)^2 = n^2/k total,
// so k too LOW starves parallelism (k cells = the join's key space)
// and goes quadratic with corpus growth; k too HIGH pays the n·k
// assignment/fit cost. Measures semanticDropList on synthetic
// deterministic vectors across a k sweep at fixed n.
// args: [n=128000] [dim=32] [k...=8 32 128]
object ProbeSemantic {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 128000
    val dim = if (args.length > 1) args(1).toInt else 32
    val ks = if (args.length > 2) args.drop(2).map(_.toInt).toSeq
             else Seq(8, 32, 128)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.range(n)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          d => pmod(xxhash64(col("vec_id"), d), lit(1000000L))
            .cast("double") / 1e6 - 0.5).as("v"))
      .localCheckpoint(true)
    ks.foreach { k =>
      // rep2 = steady state (rep1 absorbs codegen + fit warmup)
      var last = 0.0
      (1 to 2).foreach { _ =>
        val t0 = System.nanoTime()
        graft.operators.Similarity
          .semanticDropList(e, k, iters = 1, tau = 0.9).count()
        last = (System.nanoTime() - t0) / 1e9
      }
      println(f"n=$n k=$k cell~${n / k} rep2=$last%.2f s")
    }
    spark.stop()
  }
}
