package graft

import org.apache.spark.sql.functions._

/** Structural + recall checks for the ANN family. */
class AnnSpec extends SparkSpec {

  test("brute top-k: 5 ranked neighbors per query, descending cosine") {
    val df = SparkEntry.queries("q_ann_cosine_topk")(spark, sf).cache()
    assert(df.count() == 50)
    val perQ = df.groupBy("q_id").agg(count(lit(1)).as("n"),
      max("rank").as("mx"), min("rank").as("mn"))
    assert(perQ.where(col("n") =!= 5 || col("mx") =!= 5 || col("mn") =!= 1).count() == 0)
    // within a query, cosine never increases with rank
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy("rank")
    val bad = df.withColumn("prev", lag("cos", 1).over(w))
      .where(col("prev").isNotNull && col("cos") > col("prev")).count()
    assert(bad == 0)
    df.unpersist()
  }

  test("no self-matches in either ANN variant") {
    Seq("q_ann_cosine_topk", "q_ann_ivf").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sf)
      assert(df.where(col("q_id") === col("vec_id")).count() == 0, s"$q self-match")
    }
  }

  test("IVF structure: k results per query, recall floor vs exact baseline") {
    val ivf = SparkEntry.queries("q_ann_ivf")(spark, sf).cache()
    assert(ivf.count() == 50)
    assert(ivf.groupBy("q_id").count().where(col("count") =!= 5).count() == 0)
    // nprobe=2 of 10 cells on near-uniform vectors (ANN's worst case):
    // recall is data-bound ~0.46 here; assert a floor that catches
    // regressions (e.g. probing the wrong cells → near-zero overlap).
    val brute = SparkEntry.queries("q_ann_cosine_topk")(spark, sf)
      .select("q_id", "vec_id")
    val hits = ivf.select("q_id", "vec_id").intersect(brute).count()
    assert(hits >= 15, s"IVF recall collapsed: $hits/50 overlap with exact top-k")
    ivf.unpersist()
  }

  test("IVF recall rises monotonically with nprobe and reaches 100% at all cells") {
    val brute = SparkEntry.queries("q_ann_cosine_topk")(spark, sf)
      .select("q_id", "vec_id").cache()
    val total = brute.count()
    val nCells = Tables.embeddings(spark, sf)
      .where(col("vec_id") % 50 === 0).count().toInt
    val recalls = Seq(1, 2, nCells).map { np =>
      val hits = graft.operators.Similarity.annIvfWithProbes(spark, sf, np)
        .select("q_id", "vec_id").intersect(brute).count()
      np -> hits.toDouble / total
    }
    recalls.sliding(2).foreach { case Seq((npA, rA), (npB, rB)) =>
      assert(rB >= rA, s"recall fell raising nprobe $npA→$npB: $rA → $rB")
    }
    // probing every cell scans the whole corpus — must equal exact top-k
    assert(recalls.last._2 == 1.0,
      s"nprobe=$nCells (all cells) must reproduce the exact baseline: $recalls")
    brute.unpersist()
  }

  test("IVF cosine scores match the exact scores for overlapping pairs") {
    val ivf = SparkEntry.queries("q_ann_ivf")(spark, sf)
      .select(col("q_id"), col("vec_id"), col("cos").as("ivf_cos"))
    val brute = SparkEntry.queries("q_ann_cosine_topk")(spark, sf)
      .select(col("q_id"), col("vec_id"), col("cos").as("b_cos"))
    val bad = ivf.join(brute, Seq("q_id", "vec_id"))
      .where(col("ivf_cos") =!= col("b_cos")).count()
    assert(bad == 0, "cosine computed differently between IVF and brute paths")
  }
}
