package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Registry-integrity guard. A Scala `Map("k" -> a, ..., "k" -> b)`
  * keeps only the LAST duplicate key — a second definition of an
  * existing query name silently shadows the first, and the oracle
  * gate stays green against the surviving pair (this bit round 8:
  * a new q_profile landed dead behind an existing one and every
  * check still passed). Two layers of defense:
  *
  *  1. Runtime: the combined SparkEntry maps must be exactly the
  *     disjoint union of their constituents (catches the same name
  *     defined in two query OBJECTS).
  *  2. Source scan: within one Map literal in the query sources, a
  *     top-level `"name" ->` entry may appear only once (catches the
  *     same name defined twice in the SAME literal, which no runtime
  *     check can see).
  */
class QueryRegistrySpec extends AnyFunSuite {

  private val defGroups: Seq[(String, Map[String, _])] = Seq(
    "KvQueries" -> KvQueries.defs,
    "RelationalQueries.defs" -> RelationalQueries.defs,
    "RelationalQueries.defs2" -> RelationalQueries.defs2,
    "TpchQueries" -> TpchQueries.defs,
    "TextQueries" -> TextQueries.defs,
    "DedupQueries" -> DedupQueries.defs,
    "SimQueries" -> SimQueries.defs,
    "MmQueries" -> MmQueries.defs,
    "UdfQueries" -> UdfQueries.defs,
    "StreamQueries" -> StreamQueries.defs)

  test("no query name is defined by two query objects") {
    val all = defGroups.flatMap { case (g, m) => m.keys.map(_ -> g) }
    val dups = all.groupBy(_._1).filter(_._2.size > 1)
    assert(dups.isEmpty,
      s"shadowed across objects: ${dups.map { case (k, gs) =>
        s"$k in ${gs.map(_._2).mkString("+")}" }.mkString(", ")}")
    assert(graft.SparkEntry.queries.size === defGroups.map(_._2.size).sum)
  }

  test("every oracle belongs to a defined query") {
    val q = graft.SparkEntry.queries.keySet
    val orphans = graft.SparkEntry.oracleSql.keySet -- q
    assert(orphans.isEmpty, s"oracles without a query: $orphans")
  }

  test("checked() refuses duplicate keys (the in-literal guard every " +
      "registry is now built through)") {
    assert(checked("a" -> 1, "b" -> 2) === Map("a" -> 1, "b" -> 2))
    val e = intercept[IllegalArgumentException] {
      checked("a" -> 1, "b" -> 2, "a" -> 3)
    }
    assert(e.getMessage.contains("a"))
  }

  test("every registry literal in the query sources is built through " +
      "checked(), not Map()") {
    // a raw `= Map(` at a defs/oracles/prepares definition would
    // reintroduce the silent-shadowing hazard
    val dir = java.nio.file.Paths.get("src/main/scala/graft/queries")
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    val defn = """(val|def) (defs2?|oracles2?|prepares|staticOracles)\b""".r.unanchored
    java.nio.file.Files.list(dir).forEach { p =>
      if (p.toString.endsWith(".scala")) {
        val lines = java.nio.file.Files.readString(p,
          java.nio.charset.StandardCharsets.UTF_8).linesIterator.toVector
        lines.zipWithIndex.foreach { case (ln, i) =>
          if (defn.findFirstIn(ln).isDefined) {
            // the literal opens on this line or one of the next two
            val window = lines.slice(i, i + 3).mkString(" ")
            if (window.contains("= Map(") || window.endsWith("Map("))
              bad += s"${p.getFileName}:${i + 1} uses Map( — use checked("
          }
        }
      }
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }
}
