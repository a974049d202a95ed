package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md §4 scale notes; no reference
  * analogue — the reference's backend DBMS owned physical execution).
  *
  * At 100 TB a handful of hot keys (one viral user, one default enum value)
  * can put an entire shuffle partition on one executor. Two standard
  * remedies, both result-identical to their naive forms:
  *
  *  - **Salted join**: spread each fact row of a hot key across `buckets`
  *    shuffle partitions by a per-row salt, and replicate the (small) build
  *    side once per bucket. The join output is exactly the naive join —
  *    every (fact row, dim row) pair still meets exactly once.
  *  - **Two-phase salted aggregate**: partial-aggregate on (key, salt),
  *    then final-aggregate on key. With exact decimal sums the regrouping
  *    is value-identical (decimal addition is associative/commutative —
  *    this is another payoff of never summing raw doubles).
  *
  * AQE's skew-join handling (on by default) covers sort-merge joins; these
  * helpers cover the hash-aggregate and broadcast-ineligible cases AQE
  * doesn't split.
  */
object Skew {

  /** Per-row salt in [0, buckets): deterministic in the row's own values
    * (any assignment works for correctness; hashing the whole row spreads
    * hot keys whose other columns vary).
    */
  def rowSalt(df: DataFrame, buckets: Int): Column =
    pmod(hash(df.columns.map(col).toSeq: _*), lit(buckets))

  /** Equi-join `fact ⋈ dim` on `key`, salted across `buckets` partitions.
    * `dim` is replicated `buckets`× (it must be the small side — exactly
    * the situation where one hot fact key breaks a plain shuffle join).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, buckets: Int): DataFrame = {
    val saltedFact = fact.withColumn("_salt", rowSalt(fact, buckets))
    val saltedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedFact.join(saltedDim, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase aggregate: partial on (keys, salt), final on keys.
    * `partial` and `finalAgg` must be a decomposable pair (sum/sum,
    * count/sum, min/min, …).
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], buckets: Int,
      partials: Seq[(Column, String)], finals: Seq[String] => Seq[Column]): DataFrame = {
    val salted = df.withColumn("_salt", rowSalt(df, buckets))
    val phase1 = salted.groupBy((keys :+ "_salt").map(col): _*)
      .agg(partials.head._1.as(partials.head._2),
        partials.tail.map { case (c, n) => c.as(n) }: _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(finals(partials.map(_._2)).head, finals(partials.map(_._2)).tail: _*)
  }
}
