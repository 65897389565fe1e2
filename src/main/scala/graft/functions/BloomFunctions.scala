package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Session registration for Spark's own Bloom-filter expressions —
  * the codegen'd sketch pair Catalyst uses for runtime row-level
  * filtering (InjectRuntimeFilter), surfaced as SQL functions so
  * graft's decontamination prefilter (#127) can build a benchmark
  * sketch with an ordinary aggregate and probe it map-side:
  *
  *  - `bloom_agg(xxhash64_value, est_items, num_bits)` → BINARY: one
  *    fixed-size Bloom filter absorbing the group's long hashes —
  *    mergeable partials, so the build is one pass over the benchmark
  *    with a bounded (num_bits/8-byte) result whatever the input
  *    size.
  *  - `bloom_might_contain(filter_bytes, xxhash64_value)` → BOOLEAN:
  *    the probe; `filter_bytes` must be foldable (a literal), which is
  *    exactly how the built sketch rides into every task. NO false
  *    negatives by construction — a `false` is definitive, so
  *    filtering on it can only drop rows an exact join would also
  *    drop.
  *
  * Values on BOTH sides must be the same `xxhash64(...)` longs (the
  * aggregate and the probe share the sketch's long-hash encoding; raw
  * strings would hash differently). Public Spark internals only —
  * org.apache.spark.sql.catalyst.expressions.aggregate
  * .BloomFilterAggregate / BloomFilterMightContain.
  */
object BloomFunctions {
  def register(spark: SparkSession): Unit = {
    val agg = FunctionIdentifier("bloom_agg")
    if (!spark.sessionState.functionRegistry.functionExists(agg))
      spark.sessionState.functionRegistry.registerFunction(
        agg,
        new ExpressionInfo(classOf[BloomFilterAggregate].getName, "bloom_agg"),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 3,
            s"bloom_agg expects (value, est_items, num_bits), got ${exprs.length}")
          new BloomFilterAggregate(exprs(0), exprs(1), exprs(2))
        })
    val mc = FunctionIdentifier("bloom_might_contain")
    if (!spark.sessionState.functionRegistry.functionExists(mc))
      spark.sessionState.functionRegistry.registerFunction(
        mc,
        new ExpressionInfo(classOf[BloomFilterMightContain].getName,
          "bloom_might_contain"),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 2,
            s"bloom_might_contain expects (filter, value), got ${exprs.length}")
          BloomFilterMightContain(exprs(0), exprs(1))
        })
  }
}
