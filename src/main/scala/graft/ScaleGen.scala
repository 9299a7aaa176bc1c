package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up replicator for the driver's testdata: builds an sf(0.1×F)
  * directory from sf0.1 by F-way replication with DISJOINT key spaces,
  * so every join keeps its per-shard selectivity and the scaling shape
  * of a query is exactly "same plan, F× the rows" — the property the
  * 100×-scale bench evidence needs. Layout matches the driver's
  * (one flat `<table>.parquet` file each, readable by both Spark and
  * DuckDB's `read_parquet`), so Bench/Verify/check.py run unmodified
  * against the output.
  *
  * Copy-decorrelation, so similarity workloads scale linearly instead
  * of discovering F exact copies of everything:
  *  - `documents.text` goes through a per-copy alphabet rotation
  *    (token boundaries, lengths and within-copy duplicate structure
  *    are preserved; shingle sets across copies are disjoint);
  *  - `embeddings.embedding` gets deterministic per-(copy,id,dim)
  *    noise (±0.2), decorrelating cross-copy cosine while keeping
  *    within-copy neighborhoods.
  *
  * Usage: runMain graft.ScaleGen <srcSfDir> <dstDir> <factor>
  */
object ScaleGen {

  def main(args: Array[String]): Unit = {
    val Array(srcDir, dstDir, fStr) = args
    val factor = fStr.toInt
    require(factor >= 1 && factor <= 26, "factor must be in [1,26]") // 26: alphabet rotations
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scalegen")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(dstDir))

    def src(t: String): DataFrame = spark.read.parquet(s"$srcDir/$t.parquet")
    // Keys are 0-based, so the disjoint-copy stride is max+1 — a stride
    // of max would overlap each copy's key 0 with the previous copy's
    // max (9 duplicate orderkeys at factor 10, which a MERGE source
    // rightly rejects as a cardinality violation).
    def maxOf(t: String, c: String): Long =
      src(t).agg(max(col(c)).cast("long")).head.getLong(0) + 1L

    val maxCust = maxOf("customer", "c_custkey")
    val maxSupp = maxOf("supplier", "s_suppkey")
    val maxPart = maxOf("part", "p_partkey")
    val maxOrd = maxOf("orders", "o_orderkey")
    val maxEvent = maxOf("events", "event_id")
    val maxUser = maxOf("events", "user_id")
    val maxDoc = maxOf("documents", "doc_id")
    val maxVec = maxOf("embeddings", "vec_id")

    /** F copies of `t`, copy i transformed by `f(df, i)`. Copy 0 is the
      * untouched original, so sf0.1 is a strict subset of the output. */
    def replicate(t: String)(f: (DataFrame, Int) => DataFrame): DataFrame = {
      val base = src(t)
      (0 until factor).map(i => f(base, i)).reduce(_ unionByName _)
    }
    def shift(df: DataFrame, c: String, by: Long): DataFrame =
      df.withColumn(c, (col(c) + lit(by)).cast(df.schema(c).dataType))

    val lower = "abcdefghijklmnopqrstuvwxyz"
    def rot(s: String, i: Int) = s.drop(i) + s.take(i)

    val tables: Seq[(String, DataFrame)] = Seq(
      "region" -> src("region"),
      "nation" -> src("nation"),
      "customer" -> replicate("customer")((d, i) => shift(d, "c_custkey", i * maxCust)),
      "supplier" -> replicate("supplier")((d, i) => shift(d, "s_suppkey", i * maxSupp)),
      "part" -> replicate("part")((d, i) => shift(d, "p_partkey", i * maxPart)),
      "orders" -> replicate("orders") { (d, i) =>
        shift(shift(d, "o_orderkey", i * maxOrd), "o_custkey", i * maxCust)
      },
      "lineitem" -> replicate("lineitem") { (d, i) =>
        shift(shift(shift(d, "l_orderkey", i * maxOrd),
          "l_partkey", i * maxPart), "l_suppkey", i * maxSupp)
      },
      "events" -> replicate("events") { (d, i) =>
        shift(shift(d, "event_id", i * maxEvent), "user_id", i * maxUser)
      },
      "documents" -> replicate("documents") { (d, i) =>
        shift(d, "doc_id", i * maxDoc).withColumn("text",
          translate(col("text"),
            lower + lower.toUpperCase, rot(lower, i) + rot(lower, i).toUpperCase))
      },
      "embeddings" -> replicate("embeddings") { (d, i) =>
        val noisy =
          if (i == 0) d
          else d.withColumn("embedding", expr(
            s"""transform(embedding, (x, j) ->
               |  cast(x + (pmod(hash(vec_id, j, $i), 2001) - 1000) / 5000.0
               |       as float))""".stripMargin))
        shift(noisy, "vec_id", i * maxVec)
      }
    )

    tables.foreach { case (t, df) =>
      val tmp = s"$dstDir/_tmp_$t"
      // Small row groups (4 MB uncompressed buffer vs the 128 MB
      // default): a Spark scan can parallelize at most one task per row
      // group, and the coalesce(1) flat file would otherwise carry a
      // handful of giant groups — sf2 orders measured 6 groups, capping
      // every per-row-heavy query at 6 of 32 cores and masquerading as
      // super-linear scaling. Real cluster tables have thousands of
      // groups; this makes the local evidence runs representative.
      df.coalesce(1).write.mode("overwrite")
        .option("parquet.block.size", 4L * 1024 * 1024)
        .parquet(tmp)
      val part = Files.list(Paths.get(tmp)).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet"))
        .getOrElse(sys.error(s"no parquet part written for $t"))
      Files.move(part, Paths.get(s"$dstDir/$t.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      // drop the now-empty staging dir (and its _SUCCESS marker)
      Files.list(Paths.get(tmp)).iterator().asScala.foreach(Files.delete)
      Files.delete(Paths.get(tmp))
      println(s"[scalegen] $t -> $dstDir/$t.parquet")
    }
    spark.stop()
  }

  private implicit class IterWrap[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext = it.hasNext; def next() = it.next()
    }
  }
}
