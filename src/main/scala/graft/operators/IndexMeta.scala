package graft.operators

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Versioned JSON sidecar metadata for persisted indexes
  * (IncrementalDedup signature indexes, AnnLsh bucket indexes, Ivf
  * centroid sets). A one-file JSON document is portable across JVM
  * versions and readable by any tool — unlike the Java-serialized
  * `params.bin` the first index format used, which coupled the on-disk
  * layout to `ObjectInputStream` compatibility. Readers reject the
  * legacy binary format explicitly (with a rebuild message) rather than
  * failing with a deserialization stack trace, and reject unknown
  * future `format` versions the same way. */
private[graft] object IndexMeta {

  /** Current sidecar format version. Bump on any layout change; readers
    * accept exactly this version. */
  val FormatVersion = 1

  private def mapper = new ObjectMapper()

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private[graft] def writeText(spark: SparkSession, path: String, text: String): Unit = {
    val p = new Path(path)
    val out = fs(spark, p).create(p, true)
    try out.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private[graft] def readText(spark: SparkSession, path: String): String = {
    val p = new Path(path)
    val in = fs(spark, p).open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      buf.toString("UTF-8")
    } finally in.close()
  }

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    fs(spark, p).exists(p)
  }

  /** Per-layout-directory partition-count sidecar, stored INSIDE the
    * partitioned data directory as `_graft_meta.json` (underscore-prefixed
    * files are invisible to Spark's parquet reader, like `_SUCCESS`). The
    * count travels with the directory through compact's rename swap, so a
    * crash between the two table swaps can never pair a directory with a
    * stale partition count — each live dir always describes itself. */
  def writeDirMeta(spark: SparkSession, dir: String, parts: Int,
      rows: Long = -1L): Unit = {
    val node = mapper.createObjectNode()
    node.put("format", FormatVersion)
    node.put("parts", parts)
    // optional: the build/compact-time row count. Partition counts are
    // sometimes chosen explicitly (bench pins, caller overrides), so
    // parts × rows-per-dir is NOT a reliable size estimate — routing
    // decisions (pruned vs streamed probe) need the real count.
    if (rows >= 0L) node.put("rows", rows)
    writeText(spark, s"$dir/_graft_meta.json", node.toString)
  }

  /** Read the partition count written by [[writeDirMeta]]. */
  def readDirMeta(spark: SparkSession, dir: String): Int = {
    val path = s"$dir/_graft_meta.json"
    if (!exists(spark, path))
      throw new IllegalStateException(
        s"$dir has no _graft_meta.json partition sidecar (pre-v2 layout); " +
          "rebuild the index with the current writer")
    val node = mapper.readTree(readText(spark, path))
    val fmt = Option(node.get("format")).map(_.asInt(-1)).getOrElse(-1)
    if (fmt != FormatVersion)
      throw new IllegalStateException(
        s"$path has format version $fmt; this reader supports $FormatVersion")
    val v = node.get("parts")
    if (v == null)
      throw new IllegalStateException(s"$path is missing 'parts'")
    v.asInt
  }

  /** The build/compact-time row count recorded by [[writeDirMeta]], when
    * present (indexes written before the key existed return None — the
    * caller falls back to its partition-count heuristic). */
  def readDirRows(spark: SparkSession, dir: String): Option[Long] = {
    val path = s"$dir/_graft_meta.json"
    if (!exists(spark, path)) None
    else Option(mapper.readTree(readText(spark, path)).get("rows"))
      .map(_.asLong)
  }

  /** Write `{"format":1,"k1":v1,…}` to `$dir/params.json`. */
  def writeParams(spark: SparkSession, dir: String, params: Map[String, Int]): Unit = {
    val node = mapper.createObjectNode()
    node.put("format", FormatVersion)
    params.foreach { case (k, v) => node.put(k, v) }
    writeText(spark, s"$dir/params.json", node.toString)
  }

  /** Read the named integer parameters from `$dir/params.json`. A
    * legacy Java-serialized `$dir/params.bin` (pre-v1 index layout) is
    * rejected with an explicit rebuild message. */
  def readParams(spark: SparkSession, dir: String, keys: Seq[String]): Map[String, Int] = {
    val jsonPath = s"$dir/params.json"
    if (!exists(spark, jsonPath)) {
      if (exists(spark, s"$dir/params.bin"))
        throw new IllegalStateException(
          s"$dir holds a legacy Java-serialized index (params.bin, pre-v1 " +
            "format); rebuild it with the current writer (saveSignatures / " +
            "saveIndex) to get the portable params.json sidecar")
      throw new java.io.FileNotFoundException(s"no index sidecar at $jsonPath")
    }
    val node = mapper.readTree(readText(spark, jsonPath))
    val fmt = Option(node.get("format")).map(_.asInt(-1)).getOrElse(-1)
    if (fmt != FormatVersion)
      throw new IllegalStateException(
        s"$jsonPath has format version $fmt; this reader supports $FormatVersion")
    keys.map { k =>
      val v = node.get(k)
      if (v == null)
        throw new IllegalStateException(s"$jsonPath is missing parameter '$k'")
      k -> v.asInt
    }.toMap
  }

  /** Persist an IVF centroid matrix as versioned JSON at `path`
    * (float values round-trip exactly through their shortest decimal
    * form, so a loaded index probes bit-identically). */
  def writeCentroids(spark: SparkSession, path: String,
      centroids: Array[Array[Float]]): Unit = {
    val node = mapper.createObjectNode()
    node.put("format", FormatVersion)
    node.put("kind", "ivf-centroids")
    node.set[com.fasterxml.jackson.databind.JsonNode](
      "centroids", mapper.valueToTree(centroids))
    writeText(spark, path, node.toString)
  }

  /** Load a centroid matrix written by [[writeCentroids]]; a legacy
    * Java-serialized centroid file at the same path is rejected with an
    * explicit rebuild message. */
  def readCentroids(spark: SparkSession, path: String): Array[Array[Float]] = {
    val text = readText(spark, path)
    val node =
      try mapper.readTree(text)
      catch {
        case _: com.fasterxml.jackson.core.JacksonException =>
          throw new IllegalStateException(
            s"$path is not JSON — likely a legacy Java-serialized centroid " +
              "file (pre-v1 format); re-save it with Ivf.save to get the " +
              "portable JSON form")
      }
    if (node == null || !node.isObject || node.get("centroids") == null)
      throw new IllegalStateException(
        s"$path is not a v$FormatVersion ivf-centroids document")
    val fmt = Option(node.get("format")).map(_.asInt(-1)).getOrElse(-1)
    if (fmt != FormatVersion)
      throw new IllegalStateException(
        s"$path has format version $fmt; this reader supports $FormatVersion")
    mapper.treeToValue(node.get("centroids"), classOf[Array[Array[Float]]])
  }
}
