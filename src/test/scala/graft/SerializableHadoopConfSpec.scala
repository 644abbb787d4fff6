package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration
import org.scalatest.funsuite.AnyFunSuite

/** The shared-master contract of [[SerializableHadoopConf]] (r16): a
  * round-tripped instance hands back the memoized master Configuration,
  * which is READ-ONLY — mutation must fail fast (a silent task-side set
  * would race across every concurrent task in the JVM), while the
  * documented escape hatch (copy, then mutate the copy) must keep working. */
class SerializableHadoopConfSpec extends AnyFunSuite {

  private def roundTrip(src: Configuration): Configuration = {
    val bos = new ByteArrayOutputStream()
    val out = new ObjectOutputStream(bos)
    out.writeObject(new SerializableHadoopConf(src))
    out.close()
    val in = new ObjectInputStream(new ByteArrayInputStream(bos.toByteArray))
    in.readObject().asInstanceOf[SerializableHadoopConf].value
  }

  test("deserialized conf preserves content and refuses mutation") {
    val src = new Configuration(false)
    src.set("graft.test.key", "v1")
    src.set("graft.test.other", "v2")
    val got = roundTrip(src)
    assert(got.get("graft.test.key") == "v1")
    assert(got.get("graft.test.other") == "v2")
    intercept[UnsupportedOperationException] { got.set("graft.test.key", "poison") }
    intercept[UnsupportedOperationException] { got.unset("graft.test.key") }
    // The race the guard prevents never happened: value unchanged.
    assert(got.get("graft.test.key") == "v1")
  }

  test("the documented copy escape hatch stays mutable") {
    val src = new Configuration(false)
    src.set("graft.test.key", "v1")
    val shared = roundTrip(src)
    val copy = new Configuration(shared)
    copy.set("graft.test.key", "mine")
    assert(copy.get("graft.test.key") == "mine")
    assert(shared.get("graft.test.key") == "v1")
  }

  test("decode memo returns the same master for identical payloads") {
    val src = new Configuration(false)
    src.set("graft.test.key", "v1")
    val a = roundTrip(src)
    val b = roundTrip(src)
    assert(a eq b)
  }
}
