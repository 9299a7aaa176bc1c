package graft.flow

import scala.collection.mutable

/** A unit of work that reads some named tables and materializes one or
  * more named tables — the Cascading `Flow` analog. `run` executes the
  * Spark action(s) that materialize the sinks.
  */
final case class Flow(name: String,
                      sources: Set[String],
                      sinks: Set[String])(val run: () => Unit) {
  require(sinks.nonEmpty, s"flow $name must declare at least one sink")
}

/** Dependency-ordered multi-flow runner — the `Cascade` analog
  * (`MultiFamilyCascadeHBaseTest.java:83`): execution order is computed
  * from shared table identity (producer before consumer), NOT from
  * registration order — the reference's test passes flows in reverse
  * order intentionally (comment at `:83,:97`) to prove exactly this.
  *
  * In Spark, intra-query ordering is free (lazy DataFrames); this runner
  * provides the inter-flow ordering: materialize table A before any flow
  * that sources A runs. All scheduling is driver-side; there is no
  * process boundary.
  */
final class Cascade(flows: Seq[Flow],
                    sinkDropper: Option[String => Unit] = None) {
  require(flows.map(_.name).distinct.size == flows.size, "duplicate flow names")

  /** `Flow.deleteSinks` analog: the reference forces a pre-run drop of
    * every sink table (`MultiFamilyCascadeHBaseTest.java:85`) so a
    * re-run starts clean instead of APPEND-accumulating. `sinkDropper`
    * maps a sink name to its drop action (e.g. `KvTable.drop`). */
  def deleteSinks(): Unit = {
    val drop = sinkDropper.getOrElse(throw new IllegalStateException(
      "deleteSinks requires a sinkDropper (name => drop action)"))
    flows.flatMap(f => f.sinks).distinct.foreach(drop)
  }

  /** Topological order: edge producer -> consumer when a sink of one flow
    * is a source of another. Deterministic (stable by registration index
    * among ready flows). Throws on cycles.
    */
  def executionOrder: Seq[Flow] = {
    val producers = flows.flatMap(f => f.sinks.map(_ -> f)).groupMap(_._1)(_._2)
    val deps: Map[Flow, Set[Flow]] = flows.map { f =>
      f -> f.sources.flatMap(s => producers.getOrElse(s, Nil)).filterNot(_ == f)
    }.toMap
    val remaining = mutable.LinkedHashSet(flows: _*)
    val done = mutable.LinkedHashSet.empty[Flow]
    while (remaining.nonEmpty) {
      val ready = remaining.filter(f => deps(f).forall(done.contains))
      if (ready.isEmpty)
        throw new IllegalStateException(
          s"cycle among flows: ${remaining.map(_.name).mkString(", ")}")
      ready.foreach { f => done += f; remaining -= f }
    }
    done.toSeq
  }

  /** Run all flows in dependency order; returns the order for inspection
    * (the tests assert producer-before-consumer like the reference's
    * cascade test asserts via row counts). With `deleteSinks = true`,
    * all sink tables are dropped BEFORE any flow runs (the reference's
    * pre-run cleanup at `MultiFamilyCascadeHBaseTest.java:85`).
    */
  def complete(deleteSinks: Boolean = false): Seq[String] = {
    if (deleteSinks) this.deleteSinks()
    val order = executionOrder
    order.foreach(_.run())
    order.map(_.name)
  }
}
