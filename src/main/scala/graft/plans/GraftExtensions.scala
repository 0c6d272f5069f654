package graft.plans

import org.apache.spark.sql.SparkSessionExtensions

/** `spark.sql.extensions` entry point: registers the engine's optimizer
  * rules with a session at build time —
  * `SparkSession.builder.config("spark.sql.extensions",
  * "graft.plans.GraftExtensions")`. Sessions created without the config get
  * the same rules from `graft.sql.functions.install` via
  * `spark.experimental.extraOptimizations`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => SpatialFilterPushdown)
    ext.injectOptimizerRule(_ => V2BboxPushdown)
    ext.injectOptimizerRule(_ => SpatialJoinRewrite)
    ext.injectPlannerStrategy(_ => IndexedSpatialJoinStrategy)
  }
}
