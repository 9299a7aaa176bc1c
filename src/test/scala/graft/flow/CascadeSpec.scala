package graft.flow

import graft.SparkSpec

class CascadeSpec extends SparkSpec {

  private def flow(name: String, sources: Set[String], sinks: Set[String],
                   log: collection.mutable.Buffer[String]): Flow =
    Flow(name, sources, sinks)(() => log += name)

  test("execution order follows tap identity, not registration order") {
    // The reference passes flows REVERSED on purpose
    // (MultiFamilyCascadeHBaseTest.java:83: connect(copyFlow, parseFlow))
    // and the cascade still runs parse -> copy.
    val log = collection.mutable.Buffer.empty[String]
    val parse = flow("parse", Set("small.txt"), Set("multitable"), log)
    val copy = flow("copy", Set("multitable"), Set("outfile"), log)
    val order = new Cascade(Seq(copy, parse)).complete()
    assert(order === Seq("parse", "copy"))
    assert(log.toSeq === Seq("parse", "copy"))
  }

  test("diamond dependencies run producers before consumers") {
    val log = collection.mutable.Buffer.empty[String]
    val a = flow("a", Set.empty, Set("t1"), log)
    val b = flow("b", Set("t1"), Set("t2"), log)
    val c = flow("c", Set("t1"), Set("t3"), log)
    val d = flow("d", Set("t2", "t3"), Set("t4"), log)
    val order = new Cascade(Seq(d, c, b, a)).complete()
    assert(order.head === "a")
    assert(order.last === "d")
    assert(order.indexOf("b") > order.indexOf("a"))
    assert(order.indexOf("c") > order.indexOf("a"))
  }

  test("cycles are rejected") {
    val log = collection.mutable.Buffer.empty[String]
    val x = flow("x", Set("t2"), Set("t1"), log)
    val y = flow("y", Set("t1"), Set("t2"), log)
    intercept[IllegalStateException] { new Cascade(Seq(x, y)).complete() }
  }

  test("unrelated flows keep registration order (deterministic)") {
    val log = collection.mutable.Buffer.empty[String]
    val fs = (1 to 5).map(i => flow(s"f$i", Set.empty, Set(s"t$i"), log))
    assert(new Cascade(fs.reverse).complete() === fs.reverse.map(_.name))
  }
}
