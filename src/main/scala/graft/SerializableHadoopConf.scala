package graft

import org.apache.hadoop.conf.Configuration

/**
 * A Hadoop `Configuration` that survives closure serialization. `Configuration`
 * itself is a `Writable` but not `java.io.Serializable`, so executor-side code
 * that resolves a FileSystem must either ship one of these or fall back to
 * `new Configuration()` — and the fallback silently drops every `spark.hadoop.*`
 * session setting (s3a credentials/endpoint, hdfs nameservices), which works on
 * file:// in tests and breaks only on a real cluster. Capture the session conf
 * on the driver (`spark.sessionState.newHadoopConf()`) and read `.value` inside
 * the task. Same shape as Spark's own `private[spark]` SerializableConfiguration.
 */
class SerializableHadoopConf(@transient var value: Configuration) extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
