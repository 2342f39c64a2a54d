package graft.engine

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** The reference's DFS client surface (SURVEY.md §2.1 S2-S6) mapped onto
  * the filesystem Spark already uses: store / retrieve / list / delete /
  * info over a warehouse directory, with the reference's write-once
  * semantics (duplicate store rejected, `cn/dfs_actions.go:17-22`).
  * Chunking/replication/checksums are delegated to the storage layer
  * (HDFS block placement + parquet page checksums), per SURVEY §2.2 M10.
  */
class Catalog(spark: SparkSession, warehouse: String) {

  private def conf: Configuration = spark.sparkContext.hadoopConfiguration
  private def fs: FileSystem = new Path(warehouse).getFileSystem(conf)

  private def target(name: String): Path = {
    require(!name.contains("/"), s"flat namespace (cn/dfs_actions.go): $name")
    new Path(warehouse, name)
  }

  /** S2: ingest a local file; duplicate names rejected. */
  def store(local: String, name: String): Unit = {
    val dst = target(name)
    if (fs.exists(dst))
      throw new IllegalArgumentException(s"file exists: $name") // :17-22
    fs.mkdirs(new Path(warehouse))
    fs.copyFromLocalFile(new Path(local), dst)
  }

  /** S3: export a stored file to a local path; refuses to overwrite
    * (cl/dfs_actions.go:305-309). */
  def retrieve(name: String, localOut: String): Unit = {
    val out = new Path(localOut)
    val localFs = out.getFileSystem(new Configuration())
    if (localFs.exists(out))
      throw new IllegalArgumentException(s"local file exists: $localOut")
    fs.copyToLocalFile(target(name), out)
  }

  /** S5: sorted listing (cl/dfs_actions.go:546-580). */
  def list(): Seq[String] = {
    val dir = new Path(warehouse)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).map(_.getPath.getName).sorted.toSeq
  }

  /** S4: whole-file delete (cn/dfs_actions.go:150-181). */
  def delete(name: String): Boolean = fs.delete(target(name), true)

  /** S6: storage metrics. */
  def info(): Map[String, Long] = {
    val dir = new Path(warehouse)
    if (!fs.exists(dir)) Map("files" -> 0L, "bytes" -> 0L)
    else {
      val st = fs.listStatus(dir)
      Map("files" -> st.length.toLong, "bytes" -> st.map(_.getLen).sum)
    }
  }
}
