package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// disposable probe main: probe 42 — r19 verdict item 4. The BPE fit
// learns its merge table from the top-`vocab` words; on the gate
// corpora the cap is VACUOUS (31 distinct words), so whether the
// rank-512 default biases the learned table on a REAL vocabulary is
// an open question this probe answers with numbers. Corpus: Zipf-1
// pseudo-words over a V=50k dictionary (rank = floor(V^u), u a
// per-slot xxhash64 uniform — top-512 ranks carry ~58% of
// occurrences, top-4096 ~77%, so the cap genuinely hides tail pair
// mass here, unlike the gate corpus). Readout per (vocab, merges)
// dial: dictionary occurrence coverage of the fit window, mean
// fertility over all docs (tokens per word, RARE words included —
// the encode side always tokenizes the full dictionary), fit wall.
// The bias verdict is fertility(512) vs fertility(4096) vs
// fertility(full) at equal merges.
// args: [nDocs=20000] [wordsPerDoc=200] [V=50000]
object ProbeBpeVocabBias {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(20000)
    val wordsPerDoc = args.lift(1).map(_.toInt).getOrElse(200)
    val v = args.lift(2).map(_.toInt).getOrElse(50000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // deterministic pseudo-word per rank: base-26 digits of the rank
    // (all-distinct by construction; longer words deeper in the tail,
    // like a real vocabulary)
    def wordOf(rank: Int): String = {
      var r = rank; val sb = new StringBuilder
      do { sb += ('a' + (r % 26)).toChar; r /= 26 } while (r > 0)
      "w" + sb.result()
    }
    def u(doc: Long, slot: Int): Double = {
      var h = doc * 6364136223846793005L + slot * 1442695040888963407L
      h ^= (h >>> 33); h *= -49064778989728563L; h ^= (h >>> 33)
      ((h >>> 11).toDouble) / (1L << 53).toDouble
    }
    val lnV = math.log(v)
    val docs = spark.range(nDocs).map { d =>
      val words = (0 until wordsPerDoc).map { s =>
        val rank = math.min(v - 1, math.exp(u(d, s) * lnV).toInt)
        wordOf(rank)
      }
      (d, words.mkString(" "))
    }.toDF("doc_id", "text").repartition(32).localCheckpoint(true)

    val total = docs.select(explode(split(col("text"), " ")).as("w"))
      .count()
    println(s"== probe 42: nDocs=$nDocs wpd=$wordsPerDoc V=$v " +
      s"(${total} occurrences) ==")
    val ranked = docs.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w")).localCheckpoint(true)
    val nDistinct = ranked.count()

    Seq((512, 64), (4096, 64), (nDistinct.toInt, 64),
        (512, 256), (4096, 256), (nDistinct.toInt, 256)).foreach {
      case (vocab, merges) =>
        val cover = ranked.limit(vocab).agg(sum("freq")).head.getLong(0)
          .toDouble / total
        val t0 = System.nanoTime()
        val fert = graft.operators.Bpe.bpeTokenize(docs,
            vocab = vocab, nMerges = merges)
          .agg(avg("fertility"),
            (sum("bpe_tokens").cast("double") / sum("alpha_words")))
          .head
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"vocab=$vocab%6d merges=$merges%4d  " +
          f"fit-window coverage=${cover * 100}%5.1f%%  " +
          f"mean-doc fertility=${fert.getDouble(0)}%6.4f  " +
          f"corpus fertility=${fert.getDouble(1)}%6.4f  wall=$wall%6.1f s")
        spark.catalog.clearCache()
    }
    println(s"distinct words: $nDistinct")
    spark.stop()
  }
}
