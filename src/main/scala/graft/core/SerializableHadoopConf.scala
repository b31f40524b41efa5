package graft.core

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration

/** Ships the session's Hadoop configuration into executor closures.
  *
  * `Configuration` is not `java.io.Serializable`; building a default
  * `new Configuration()` on executors silently drops any non-default
  * store config (s3a credentials/endpoints, custom fs impls) that the
  * driver session carries. This wrapper serializes the fully-resolved
  * properties through the standard `Writable` protocol so executors see
  * exactly the driver's filesystem view.
  */
class SerializableHadoopConf(@transient var value: Configuration)
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
