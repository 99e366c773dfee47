package graft.util

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration

/**
 * Serializable wrapper for a Hadoop `Configuration` so executor-side tasks
 * (footer-stats reads, segment partition readers, segment writers) see the
 * SESSION's hadoop settings — `spark.hadoop.*` credentials, endpoints,
 * filesystem impls — instead of a bare `new Configuration()` that only
 * works on a default-configured local filesystem. (Spark ships the same
 * pattern internally, but its class is `private[spark]`.)
 */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {

  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }

  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
