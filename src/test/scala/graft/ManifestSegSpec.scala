package graft

import java.io.File
import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.io.Upsert

/** Segmented manifests (Iceberg manifest-list shape — round-4 backlog
  * #2): above an inline file-count threshold the root `_manifest-<gen>`
  * references per-bucket-group `_mseg-<gen>-<seg>` files instead of
  * inlining every data file, and a commit re-references UNCHANGED
  * segments from the previous generation by name. Commit metadata I/O
  * is then O(touched buckets) — the property that keeps a 100 TB
  * table's per-batch commit flat as file counts grow. The root rename
  * stays the single visibility point, so every snapshot-isolation
  * invariant of the inline form carries over unchanged.
  */
class ManifestSegSpec extends SparkSpec {
  import spark.implicits._

  private def segFiles(dir: String): Seq[String] =
    new File(dir).listFiles().map(_.getName).filter(_.startsWith("_mseg-")).toSeq.sorted

  private def withSegmented[A](body: => A): A = {
    spark.conf.set("spark.graft.manifest.inlineMaxFiles", "0")
    spark.conf.set("spark.graft.manifest.bucketsPerSegment", "4")
    try body
    finally {
      spark.conf.unset("spark.graft.manifest.inlineMaxFiles")
      spark.conf.unset("spark.graft.manifest.bucketsPerSegment")
    }
  }

  test("segmented commit: content identical to inline; point merge rewrites one segment") {
    withSegmented {
      val dir = Files.createTempDirectory("mseg").toString + "/t"
      val base = (1 to 200).map(i => (s"k$i", 1L, s"v$i")).toDF("id", "ver", "payload")
      Upsert.merge(spark, dir, base, pk = Seq("id"), versionCol = "ver")

      val m1 = Upsert.currentManifest(spark, dir).get
      assert(m1.segRefs.nonEmpty, "create above threshold commits segmented")
      // 16 default buckets / 4 per segment = 4 segments
      assert(m1.segRefs.keySet == m1.files.keySet.map(b => Math.floorDiv(b, 4)),
        "every populated bucket group has a segment ref")
      val got1 = Upsert.read(spark, dir).select("id", "ver", "payload")
        .as[(String, Long, String)].collect().toSet
      assert(got1 == base.as[(String, Long, String)].collect().toSet)

      // point merge: one key → one bucket → ONE segment rewritten
      val segsBefore = segFiles(dir)
      Upsert.merge(spark, dir, Seq(("k1", 2L, "v1b")).toDF("id", "ver", "payload"),
        pk = Seq("id"), versionCol = "ver")
      val m2 = Upsert.currentManifest(spark, dir).get
      val fresh = segFiles(dir).diff(segsBefore)
      assert(fresh.size == 1, s"exactly one new segment file, got $fresh")
      val reused = m2.segRefs.values.toSet.intersect(m1.segRefs.values.toSet)
      assert(reused.size == m2.segRefs.size - 1,
        "all other segments re-referenced from the previous generation by name")

      val got2 = Upsert.read(spark, dir)
        .filter(col("id") === "k1").select("payload").as[String].collect().toSeq
      assert(got2 == Seq("v1b"))
    }
  }

  test("vacuum keeps reused old-generation segments; orphaned segments collected") {
    withSegmented {
      val dir = Files.createTempDirectory("mseg").toString + "/t"
      val base = (1 to 100).map(i => (s"k$i", 1L, s"v$i")).toDF("id", "ver", "payload")
      Upsert.merge(spark, dir, base, pk = Seq("id"), versionCol = "ver")
      Upsert.merge(spark, dir, Seq(("k2", 2L, "x")).toDF("id", "ver", "payload"),
        pk = Seq("id"), versionCol = "ver")
      val m2 = Upsert.currentManifest(spark, dir).get
      assert(m2.segRefs.values.exists(_.contains(f"-${m2.gen - 1}%020d-")),
        "newest root references at least one segment minted by the previous gen")

      // orphan: a segment file no root references (crash before rename)
      val orphan = new File(dir, "_mseg-00000000000000000099-0")
      Files.write(orphan.toPath, "0\tnope".getBytes)

      Upsert.vacuum(spark, dir, keepManifests = 1)
      assert(!orphan.exists(), "unreferenced segment collected")
      assert(segFiles(dir).toSet == m2.segRefs.values.toSet,
        "exactly the kept root's segments survive — including reused old-gen ones")
      // table still fully readable through the kept root
      assert(Upsert.read(spark, dir).count() == 100)
      assert(Upsert.read(spark, dir)
        .filter(col("id") === "k2").select("payload").as[String].head() == "x")
    }
  }

  test("bloom point lookup and merge work unchanged through segment refs") {
    withSegmented {
      val dir = Files.createTempDirectory("mseg").toString + "/t"
      val base = (1 to 100).map(i => (s"k$i", 1L, s"v$i")).toDF("id", "ver", "payload")
      Upsert.merge(spark, dir, base, pk = Seq("id"), versionCol = "ver", bloom = true)
      Upsert.merge(spark, dir, Seq(("k7", 2L, "new")).toDF("id", "ver", "payload"),
        pk = Seq("id"), versionCol = "ver", bloom = true)
      val hit = Upsert.lookup(spark, dir, "id", Seq("k7"))
        .select("payload").as[String].collect().toSeq
      assert(hit == Seq("new"))
      assert(Upsert.read(spark, dir).count() == 100)
    }
  }
}
