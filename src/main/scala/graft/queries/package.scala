package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {
  /** A named query: (session, sf-dir) -> result DataFrame. */
  type Q = (SparkSession, String) => DataFrame

  /** Load one of the driver's testdata tables. */
  def table(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Filesystem-safe scratch location for queries that exercise the real
    * KvTable write/read path (under the repo's build dir; the driver's
    * verify and bench runs may use different sf dirs concurrently).
    */
  def scratchDir(name: String, sfDir: String): String = {
    val tag = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    s"/root/repo/target/kvscratch/${name}_$tag"
  }
}
