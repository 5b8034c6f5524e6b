package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {

  test("graft functions resolve via spark.sql.extensions") {
    val spark = SparkSession.builder()
      .appName("ext-spec").master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val t = spark.sql("SELECT murmur3_token('hello') AS t").head().getLong(0)
      assert(t == 0xcbd8a7b341bd9b02L)
      val c = spark.sql(
        "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
          "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c").head().getDouble(0)
      assert(math.abs(c - 1.0) < 1e-12)
    } finally spark.stop()
  }
}
