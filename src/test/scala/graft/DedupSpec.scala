package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Semantic checks for the dedup family beyond the row-count gates. */
class DedupSpec extends SparkSpec {

  test("exact dedup: canonical is the min doc_id of its group") {
    val df = SparkEntry.queries("q_dedup_exact")(spark, sf)
    assert(df.where(col("canonical_id") > col("doc_id")).count() == 0)
    // group_size is consistent with the number of members
    val bad = df.groupBy("canonical_id").count()
      .join(df.select(col("canonical_id"), col("group_size")).distinct(), "canonical_id")
      .where(col("count") =!= col("group_size")).count()
    assert(bad == 0)
  }

  test("minhash-LSH recovers exactly the exact-jaccard near-dup pairs") {
    // On this corpus the planted near-dups sit at jaccard >= 0.97 with a
    // wide gap to background — 16x4 banding must recover all of them.
    val lsh = SparkEntry.queries("q_dedup_minhash_lsh")(spark, sf)
      .select("doc_a", "doc_b")
    val exact = SparkEntry.queries("q_dedup_ngram_jaccard")(spark, sf)
      .select("doc_a", "doc_b")
    assert(lsh.exceptAll(exact).count() == 0, "LSH emitted a non-near-dup pair")
    assert(exact.exceptAll(lsh).count() == 0, "LSH missed a near-dup pair")
  }

  test("jaccard output is symmetric-free and thresholded") {
    val df = SparkEntry.queries("q_dedup_ngram_jaccard")(spark, sf)
    assert(df.where(col("doc_a") >= col("doc_b")).count() == 0)
    assert(df.where(col("jaccard") < 0.8 || col("jaccard") > 1.0).count() == 0)
  }

  test("simhash pairs are within the declared hamming radius") {
    val df = SparkEntry.queries("q_dedup_simhash")(spark, sf)
    assert(df.where(col("hamming") > 3).count() == 0)
    assert(df.where(col("doc_a") >= col("doc_b")).count() == 0)
  }

  test("shingle candidate generation never pairs shingle-disjoint docs") {
    // every reported pair shares at least one shingle → inter >= 1
    val df = SparkEntry.queries("q_dedup_ngram_jaccard")(spark, sf)
    assert(df.where(col("inter") < 1).count() == 0)
  }
}
