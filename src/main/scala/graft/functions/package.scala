package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graft.{CharBigramPhash, CosineSimilarity, GraftColumns, GramBuckets, L2Sq, MinHashSig, Murmur3Token, PosGramHashes, RingPartitionsTable, ShingleHashes, SimHashSig, TopicLagTable, TopicListTable, TopicOffsetsForTimeTable, TopicRecordsTable, TopicStatsTable}

/** Column-level entry points for the graft expressions, plus SQL
  * registration.
  */
package object functions {

  /** 64-bit murmur3 token of a partition key (string or binary column). */
  def murmur3_token(c: Column): Column = GraftColumns.murmur3Token(c)

  /** Cosine similarity of two ArrayType(FloatType) columns. */
  def cosine_sim(a: Column, b: Column): Column = GraftColumns.cosineSim(a, b)

  /** Squared L2 distance of two ArrayType(FloatType) columns. */
  def l2_sq(a: Column, b: Column): Column = GraftColumns.l2Sq(a, b)

  /** Hyperplane-LSH signature (sign bits) of an ArrayType(FloatType) column. */
  def srp_signature(v: Column, bits: Int, seed: Long): Column =
    GraftColumns.srpSignature(v, bits, seed)

  /** MinHash signature of an ArrayType(LongType) element-hash column. */
  def minhash_sig(hashes: Column, numPerms: Int, seed: Long): Column =
    GraftColumns.minhashSig(hashes, numPerms, seed)

  /** Distinct murmur3 hashes of the k-word shingles of lower(text). */
  def shingle_hashes(text: Column, k: Int): Column =
    GraftColumns.shingleHashes(text, k)

  /** Positional k-word window hashes (order kept, index = position). */
  def pos_gram_hashes(text: Column, k: Int): Column =
    GraftColumns.posGramHashes(text, k)

  /** 64-bit SimHash of lower(text)'s word stream. */
  def simhash_sig(text: Column): Column = GraftColumns.simhashSig(text)

  /** Hashed k-gram feature buckets (occurrence order, duplicates kept). */
  def gram_buckets(text: Column, k: Int, buckets: Int): Column =
    GraftColumns.gramBuckets(text, k, buckets)

  /** Character-bigram histogram perceptual hash (null below 2 code points). */
  def char_bigram_phash(text: Column, buckets: Int): Column =
    GraftColumns.charBigramPhash(text, buckets)

  /** Ring partition ordinal (broker*rangesPerToken + range) of a token. */
  def ring_partition(token: Column, clusterSize: Int, rangesPerToken: Int): Column =
    GraftColumns.ringPartition(token, clusterSize, rangesPerToken)

  /** Register graft functions (scalar + table-valued) for SQL use on an
    * existing session — the same set `GraftExtensions` injects.
    */
  def registerAll(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction(
      "murmur3_token", exprs => Murmur3Token(exprs.head), "built-in")
    registry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    registry.createOrReplaceTempFunction(
      "l2_sq", exprs => L2Sq(exprs(0), exprs(1)), "built-in")
    registry.createOrReplaceTempFunction(
      "minhash_sig", exprs => MinHashSig(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].longValue()), "built-in")
    registry.createOrReplaceTempFunction(
      "shingle_hashes", exprs => ShingleHashes(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()), "built-in")
    registry.createOrReplaceTempFunction(
      "pos_gram_hashes", exprs => PosGramHashes(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()), "built-in")
    registry.createOrReplaceTempFunction(
      "simhash_sig", exprs => SimHashSig(exprs.head), "built-in")
    registry.createOrReplaceTempFunction(
      "gram_buckets", exprs => GramBuckets(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue()), "built-in")
    registry.createOrReplaceTempFunction(
      "char_bigram_phash", exprs => CharBigramPhash(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()), "built-in")
    val tvf = spark.sessionState.tableFunctionRegistry
    tvf.createOrReplaceTempFunction(
      "ring_partitions", exprs => RingPartitionsTable.plan(exprs), "built-in")
    tvf.createOrReplaceTempFunction(
      "topic_records", exprs => TopicRecordsTable.plan(exprs), "built-in")
    tvf.createOrReplaceTempFunction(
      "topic_list", exprs => TopicListTable.plan(exprs), "built-in")
    tvf.createOrReplaceTempFunction(
      "topic_lag", exprs => TopicLagTable.plan(exprs), "built-in")
    tvf.createOrReplaceTempFunction(
      "topic_offsets_for_time",
      exprs => TopicOffsetsForTimeTable.plan(exprs), "built-in")
    tvf.createOrReplaceTempFunction(
      "topic_stats", exprs => TopicStatsTable.plan(exprs), "built-in")
  }
}
