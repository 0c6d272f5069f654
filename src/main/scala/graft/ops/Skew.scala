package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew utilities for hot-key joins — the manual valve for cases AQE's
  * skew-join splitting can't fix (e.g. one key holding >1 task's worth of
  * build-side rows in a shuffled hash join).
  */
object Skew {

  /** Salted inner equi-join: the skewed (large, hot-keyed) side gets a
    * random salt in [0, salts); the small side is replicated `salts` times;
    * the join key becomes (key, salt), spreading each hot key over `salts`
    * reducers. Exact same rows as `large.join(small, keys)` — each large row
    * meets each matching small row exactly once (at its own salt).
    */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      salts: Int = 16): DataFrame = {
    require(salts > 0, "salts must be positive")
    val salted = large.withColumn("_salt", (rand(seed = 42) * salts).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, keys :+ "_salt").drop("_salt")
  }
}
