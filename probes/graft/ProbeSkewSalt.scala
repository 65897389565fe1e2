package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

// disposable probe main: r18 verdict item 7 — price the §5 skew claim.
// saltedJoin/distinctPerKeySalted exist for where AQE's skew split
// can't act (stream-static joins, forced co-partitioning), but the
// salt-vs-AQE crossover was never measured. Planted zipf-ish corpus:
// hotShare of fact rows on ONE key, 25% over 100 warm keys, the rest
// uniform over |dim| keys. Measures, at each hot share:
//   join:  plain+AQE (skew split ON) / plain AQE-off (the
//          stream-static stand-in) / saltedJoin salts in {8, 32}
//   agg:   direct countDistinct per key / distinctPerKeySalted {8,32}
// Readout = wall seconds per flavor + result checksum equality.
// args: [nFact=20000000] [nDim=1000000] [hotShares=0.25,0.05] [userCard=5000000]
object ProbeSkewSalt {
  def main(args: Array[String]): Unit = {
    val nFact = args.headOption.map(_.toLong).getOrElse(20000000L)
    val nDim = args.lift(1).map(_.toLong).getOrElse(1000000L)
    val hotShares = args.lift(2).getOrElse("0.25,0.05")
      .split(",").map(_.trim.toDouble).toSeq
    val userCard = args.lift(3).map(_.toLong).getOrElse(5000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the dim must not broadcast: the probe prices the SHUFFLE join
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.api.Graft

    val dim = spark.range(nDim).select(col("id").as("key"),
      (col("id") * 7L % 997L).as("dval")).localCheckpoint(true)

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    for (hot <- hotShares) {
      val u = (pmod(xxhash64(col("id"), lit(1)), lit(1000000L))
        .cast("double") / 1000000.0)
      val fact = spark.range(nFact).select(
        when(u < hot, lit(0L))
          .when(u < hot + 0.25, pmod(xxhash64(col("id"), lit(2)), lit(100L)))
          .otherwise(pmod(xxhash64(col("id"), lit(3)), lit(nDim)))
          .as("key"),
        col("id").as("row_id"),
        pmod(xxhash64(col("id"), lit(4)), lit(userCard)).as("user_id"))
        .repartition(32).localCheckpoint(true)
      println(s"== nFact=$nFact nDim=$nDim hotShare=$hot userCard=$userCard " +
        s"(hot key carries ${(nFact * hot).toLong} rows) ==")

      def joinSum(df: DataFrame): Long =
        df.agg(sum(col("dval") + col("user_id"))).head.getLong(0)
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      val (want, tAqe) = time(joinSum(fact.join(dim, "key")))
      println(f"  join plain AQE-on (skew split):  $tAqe%7.2f s")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val (gotPlain, tPlain) = time(joinSum(fact.join(dim, "key")))
      println(f"  join plain AQE-off (stream-static stand-in): $tPlain%7.2f s")
      require(gotPlain == want)
      for (s <- Seq(8, 32)) {
        val (got, t) = time(joinSum(
          Graft.saltedJoin(fact, dim, "key", "row_id", s)))
        println(f"  join salted salts=$s%-2d (AQE off): $t%7.2f s")
        require(got == want, s"salted join diverged at salts=$s")
      }

      def distSum(df: DataFrame): Long =
        df.agg(sum(col("n_distinct"))).head.getLong(0)
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      val (wantD, tDirAqe) = time(distSum(
        fact.groupBy("key").agg(countDistinct("user_id").as("n_distinct"))))
      println(f"  agg direct countDistinct AQE-on: $tDirAqe%7.2f s")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val (wantD0, tDir) = time(distSum(
        fact.groupBy("key").agg(countDistinct("user_id").as("n_distinct"))))
      println(f"  agg direct countDistinct AQE-off: $tDir%7.2f s")
      require(wantD0 == wantD)
      for (s <- Seq(8, 32)) {
        val (got, t) = time(distSum(
          Graft.saltedDistinct(fact, "key", "user_id", s)
            .withColumnRenamed("distinct_ct", "n_distinct")))
        println(f"  agg salted salts=$s%-2d (AQE off): $t%7.2f s")
        require(got == wantD, s"salted distinct diverged at salts=$s")
      }
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    spark.stop()
  }
}
