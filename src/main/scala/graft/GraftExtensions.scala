package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extension entry point: makes the engine's native functions
  * available in ANY session started with
  * `--conf spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`), without per-session
  * registration calls. Injects [[graft.functions.Native.fns]] —
  * the SAME registry `Native.register` installs per-session — so the
  * two surfaces cannot drift (an earlier hand-copied list here went
  * six functions stale).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.Native.fns.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name,
          s"$name: engine-native codegen expression (see graft.functions)"),
        builder))
    }
    // the EXT-operator TABLE functions (SELECT * FROM graft_bm25(...)),
    // same shared-registry discipline as the scalar list above
    graft.functions.TableFns.fns.foreach { case (name, builder) =>
      ext.injectTableFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name,
          s"$name: engine table function (see graft.functions.TableFns)"),
        builder))
    }
  }
}
