package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Artifacts

/** The durable-artifact contract behind SharedIvfIndex and
  * SharedBucketedTables: build once, reuse while the source fingerprint
  * matches, rebuild atomically when the source changes.
  */
class ArtifactsSpec extends AnyFunSuite {

  private def tempRoot() = {
    val parent = Files.createTempDirectory("artifacts_spec")
    parent.resolve("artifact")
  }

  test("second ensureBuilt with the same fingerprint skips the build") {
    val root = tempRoot()
    var builds = 0
    Artifacts.ensureBuilt(root, "fp1") { tmp =>
      builds += 1
      Files.write(tmp.resolve("data"), "v1".getBytes(UTF_8))
    }
    Artifacts.ensureBuilt(root, "fp1") { _ => builds += 1 }
    assert(builds === 1, "unchanged fingerprint must reuse the build")
    assert(new String(Files.readAllBytes(root.resolve("data")), UTF_8) === "v1")
    Artifacts.deleteRecursively(root.getParent)
  }

  test("changed fingerprint rebuilds; stale artifact is replaced whole") {
    val root = tempRoot()
    Artifacts.ensureBuilt(root, "fp1") { tmp =>
      Files.write(tmp.resolve("data"), "v1".getBytes(UTF_8))
      Files.write(tmp.resolve("only_in_v1"), Array.emptyByteArray)
    }
    Artifacts.ensureBuilt(root, "fp2") { tmp =>
      Files.write(tmp.resolve("data"), "v2".getBytes(UTF_8))
    }
    assert(new String(Files.readAllBytes(root.resolve("data")), UTF_8) === "v2")
    // atomic replace: no leftovers of the previous build inside the root
    assert(!Files.exists(root.resolve("only_in_v1")),
      "stale build must be replaced wholesale, not merged into")
    Artifacts.deleteRecursively(root.getParent)
  }

  test("a failed build leaves the previous complete artifact in place") {
    val root = tempRoot()
    Artifacts.ensureBuilt(root, "fp1") { tmp =>
      Files.write(tmp.resolve("data"), "v1".getBytes(UTF_8))
    }
    intercept[RuntimeException] {
      Artifacts.ensureBuilt(root, "fp2") { tmp =>
        Files.write(tmp.resolve("data"), "half".getBytes(UTF_8))
        sys.error("crash mid-build")
      }
    }
    // the reader contract: root still holds the COMPLETE previous build
    assert(new String(Files.readAllBytes(root.resolve("data")), UTF_8) === "v1")
    // and the crashed temp sibling was swept
    val leftovers = {
      val s = Files.list(root.getParent)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.count(_.getFileName.toString.contains(".build"))
      } finally s.close()
    }
    assert(leftovers === 0, "crashed build temp dir must not accumulate")
    Artifacts.deleteRecursively(root.getParent)
  }

  test("fixture fingerprint changes when a source file is touched") {
    val dir = Files.createTempDirectory("artifacts_fixture")
    val tbl = dir.resolve("t.parquet")
    Files.write(tbl, "abc".getBytes(UTF_8))
    val fp1 = Artifacts.tableFingerprint(dir.toString, "t")
    // same content, same mtime → same fingerprint
    assert(Artifacts.tableFingerprint(dir.toString, "t") === fp1)
    // regenerated file (newer mtime) → different fingerprint
    Files.setLastModifiedTime(tbl,
      java.nio.file.attribute.FileTime.fromMillis(
        Files.getLastModifiedTime(tbl).toMillis + 5000))
    assert(Artifacts.tableFingerprint(dir.toString, "t") !== fp1)
    Artifacts.deleteRecursively(dir)
  }
}
