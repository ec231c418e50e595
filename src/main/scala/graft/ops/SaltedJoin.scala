package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join: salt the fact side, replicate the dim side.
  *
  * A plain shuffle join hashes every fact row for a key to ONE reduce
  * partition; with a heavy-tailed key histogram (a viral user, a hot
  * item, an over-represented language) one task receives the whole hot
  * key and the stage runs at the speed of that straggler. AQE's skew
  * handling splits oversized SORT-MERGE partitions after the fact, but
  * it only triggers inside its thresholds and cannot help shuffle-hash
  * joins that OOM before completing. Salting fixes the layout up front:
  *
  *  - fact rows get `_salt = saltSource mod salts` from any
  *    high-cardinality column (row id, hash of the payload), spreading
  *    each hot key over `salts` shuffle partitions;
  *  - the dim side is replicated `salts` times (an explode of a
  *    `salts`-element sequence — cheap when dim ≪ fact, the regime
  *    where salting applies);
  *  - the join key becomes (key, _salt), and the result is EXACTLY the
  *    plain inner equi-join — salting is a physical-layout trick with
  *    no semantic footprint, which is what the oracle checks.
  *
  * No broadcast hint anywhere: when the replicated dim still measures
  * small, AQE broadcasts it (and the salt is harmless); when it
  * doesn't, the shuffle join runs with the skew already dissolved.
  */
object SaltedJoin {

  /** Inner equi-join of `fact` and `dim` on `factKey == dimKey`,
    * salted `salts` ways. `saltSource` must be deterministic per fact
    * row (e.g. a row id) but is otherwise arbitrary — it only spreads
    * rows, it never changes the result.
    */
  def join(fact: DataFrame, dim: DataFrame,
           factKey: String, dimKey: String,
           saltSource: Column, salts: Int = 8): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val saltedFact = fact.withColumn("_salt", pmod(saltSource, lit(salts)))
    val saltedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact
      .join(saltedDim,
        saltedFact(factKey) === saltedDim(dimKey) &&
          saltedFact("_salt") === saltedDim("_salt"))
      .drop("_salt")
  }
}
