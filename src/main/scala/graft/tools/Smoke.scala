package graft.tools

import org.apache.spark.sql.functions._

import graft.Graft
import graft.functions._

/** End-to-end smoke drive of the public library surface against the
  * sf0.001 testdata: session bootstrap, custom expressions through
  * whole-stage codegen (DataFrame AND SQL registration), and the
  * flagship entry. Prints observable values for eyeballing; exits
  * nonzero on any mismatch with the known murmur3 vectors.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = Graft.session("graft-smoke")
    import spark.implicits._

    // 1. custom expression through codegen over a real DataFrame
    val df = Seq("hello", "hello, world", "123", "").toDF("key")
      .withColumn("token", murmur3_token(col("key")))
    df.show(truncate = false)
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("hello") == 0xcbd8a7b341bd9b02L, s"hello -> ${got("hello")}")
    assert(got("hello, world") == 0x342fac623a5ebc8eL)

    // 2. SQL registration path
    val viaSql = spark.sql("SELECT murmur3_token('hello') AS t").head().getLong(0)
    assert(viaSql == 0xcbd8a7b341bd9b02L, s"sql -> $viaSql")

    // 3. cosine_sim over the real embeddings table (self-sim must be 1.0)
    val emb = Graft.table(spark, sfDir, "embeddings")
    val self = emb.select(cosine_sim(col("embedding"), col("embedding")).as("s"))
      .agg(min("s"), max("s")).head()
    println(s"self-cosine range: $self")
    assert(math.abs(self.getDouble(0) - 1.0) < 1e-9)

    // 4. srp_signature determinism across two evaluations
    val sig1 = emb.select(srp_signature(col("embedding"), 16, 42).as("g")).collect()
    val sig2 = emb.select(srp_signature(col("embedding"), 16, 42).as("g")).collect()
    assert(sig1.map(_.getLong(0)).sameElements(sig2.map(_.getLong(0))))
    println(s"srp distinct buckets: ${sig1.map(_.getLong(0)).distinct.length} of ${sig1.length}")

    // 5. events ns-timestamp normalization + flagship entry
    Graft.events(spark, sfDir).select("event_id", "ts", "user_id").show(3)
    val n = graft.SparkEntry.entry(spark).count()
    println(s"entry rows: $n")
    assert(n > 0)

    // 6. DSv2 connector roundtrip: produce through the engine, read back
    // via format("graft")
    val root = java.nio.file.Files.createTempDirectory("graft-smoke").toString
    val store = new graft.engine.TopicStore(spark, root)
    store.produceStrings("smoke",
      (0 until 100).map(i => (s"k${i % 7}", s"v$i", new java.sql.Timestamp(1700000000000L + i))))
    val back = spark.read.format("graft")
      .option("root", root).option("topic", "smoke").load().count()
    println(s"graft source rows: $back")
    assert(back == 100)

    println("SMOKE OK")
    spark.stop()
  }
}
