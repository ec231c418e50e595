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

  private val SaltCol = "_graft_salt"

  /** The salted fact side (exposed for tests): `SaltCol` is a
    * deterministic value in [0, salts) per row. A NULL `saltSource`
    * maps to salt 0 — a NULL salt would make the (key, salt) equi-join
    * drop the row, silently breaking the bit-identical contract. The
    * source is cast to LONG before the mod for the same reason: a
    * fractional salt (e.g. from a DOUBLE source) would never equal the
    * dim side's integer salts 0..salts-1 and rows would vanish.
    * `pmod(cast, salts)` stays in [0, salts) for negative sources too;
    * a non-integral double truncates toward zero — still deterministic
    * per row, which is all the spread needs.
    */
  private[ops] def saltedFact(fact: DataFrame, saltSource: Column,
                              salts: Int): DataFrame =
    fact.withColumn(SaltCol,
      coalesce(pmod(saltSource.cast("long"), lit(salts.toLong)), lit(0L)))

  /** Inner equi-join of `fact` and `dim` on `factKey == dimKey`,
    * salted `salts` ways. `saltSource` must be deterministic per fact
    * row (e.g. a row id) but is otherwise arbitrary — it only spreads
    * rows, it never changes the result.
    */
  def join(fact: DataFrame, dim: DataFrame,
           factKey: String, dimKey: String,
           saltSource: Column, salts: Int = 8): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    // the working column must not shadow (and then drop) caller data
    require(!fact.columns.contains(SaltCol) && !dim.columns.contains(SaltCol),
      s"inputs must not carry a $SaltCol column")
    val sf = saltedFact(fact, saltSource, salts)
    val sd = dim.withColumn(SaltCol,
      explode(sequence(lit(0L), lit((salts - 1).toLong))))
    sf.join(sd,
        sf(factKey) === sd(dimKey) && sf(SaltCol) === sd(SaltCol))
      .drop(SaltCol)
  }
}
