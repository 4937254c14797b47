package graft.storage

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Iceberg-style metadata for the persisted index (SURVEY.md §2.6): what was
  * built from what (lineage), per-partition metrics, and commit markers that
  * make the build resumable. This sandbox has no Iceberg jars; the layout is
  * a faithful stand-in (manifest + partitioned parquet + atomic marker
  * files) behind the same storage API, swappable for a real catalog.
  */
final case class BucketMetrics(
    bucket: Int,
    terms: Long,
    postings: Long,
    tokens: Long, // sum of tf
    durationMs: Long
)

final case class StageMarker(
    stage: String,
    rows: Long,
    durationMs: Long,
    lineage: Map[String, String],
    buckets: Seq[BucketMetrics] = Nil
)

final case class IndexManifest(
    formatVersion: Int,
    source: String,
    analyzer: String,
    numDocs: Long,
    avgDocLen: Double,
    termBuckets: Int,
    blockSize: Int,
    bucketSpan: Long,
    stages: Seq[StageMarker],
    // BM25 params are part of the index contract (formatVersion 2): the WAND
    // block maxima are built WITH them, so a reloaded index scored with
    // different k1/b would prune against stale bounds — silently lossy.
    k1: Double = 1.2,
    b: Double = 0.75,
    // formatVersion 3: postings carry a doc-range partition level
    // (d_group = doc_ord / dGroupSpan) so incremental deltas are
    // directory-pruned to the touched doc ranges; keyCols/keyBuckets
    // describe the keymap table for pruned key -> doc_ord resolution.
    dGroupSpan: Long = 0L,
    keyCols: Seq[String] = Nil,
    keyBuckets: Int = 0
)

object ManifestIO {
  private val mapper = new ObjectMapper()
    .registerModule(DefaultScalaModule)
    .configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)

  /** Atomic write: temp file + move, so a marker either exists complete or
    * not at all (the resumability invariant). */
  def write[A](path: String, value: A): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    val tmp = Paths.get(path + ".tmp")
    Files.write(tmp, mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsString(value).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  def read[A](path: String, clazz: Class[A]): Option[A] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) None
    else Some(mapper.readValue(Files.readAllBytes(p), clazz))
  }

  def exists(path: String): Boolean = Files.exists(Paths.get(path))
}
