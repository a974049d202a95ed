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

  /** Two-phase salted sum/count: partial (sum, count) per (keys, salt),
    * then re-sum per keys. With decimal inputs the result is value-exact vs
    * the direct groupBy (decimal addition is associative), while each hot
    * key's partials spread over `buckets` shuffle partitions.
    * Output: keys ++ (`<name>` = exact sum cast double, `n` = count).
    */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: Column,
      name: String, buckets: Int): DataFrame = {
    val salted = df.withColumn("_salt", rowSalt(df, buckets))
    salted.groupBy((keys :+ "_salt").map(col): _*)
      .agg(sum(valueCol.cast("decimal(18,2)")).as("_psum"), count(lit(1)).as("_pn"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_psum")).cast("double").as(name), sum(col("_pn")).as("n"))
  }
}
