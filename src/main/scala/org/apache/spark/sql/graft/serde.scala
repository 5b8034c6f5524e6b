package org.apache.spark.sql.graft

import org.apache.hadoop.conf.Configuration
import org.apache.spark.util.SerializableConfiguration

/** Serializable Hadoop-configuration carrier for graft's DSv2 source:
  * executors opening topic parquet files need the driver's filesystem
  * configuration (object-store credentials, HDFS addresses).
  * `SerializableConfiguration` is `private[spark]`, hence this shim in
  * the extension package (same rationale as the expressions here).
  */
class GraftConfHolder(@transient conf: Configuration) extends Serializable {
  private val inner = new SerializableConfiguration(conf)
  def value: Configuration = inner.value
}
