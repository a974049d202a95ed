package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding similarity kernel (BASELINE.json north star: similarity search
  * over an `Array[Float]` column; no analogue in the reference, which has no
  * vector type).
  *
  * Numerical determinism: all math is double-precision with a **fixed
  * left-to-right summation order** (`aggregate` HOF folds the array in
  * order), so a SQL engine evaluating the equivalent explicit `t1 + t2 + …`
  * chain produces bit-identical IEEE-754 results — float→double casts are
  * exact, float×float products in double are exact (24-bit mantissas), and
  * each addition is exactly-rounded in a defined order.
  *
  * Scale: dot/norm/cosine are per-row scalar expressions over the array —
  * no shuffle, codegen'd HOFs inside the scan stage. Brute-force top-k is
  * a TakeOrderedAndProject (per-partition heap + driver merge of k rows,
  * no global sort). The sign-LSH path buckets vectors so candidate
  * generation becomes an equi-join on bucket id — the standard way to make
  * ANN shuffle-bounded at 10⁹+ vectors (bucket-partitioned, skew-salted if
  * a bucket is hot).
  */
object Similarity {

  /** Dot product with fixed fold order; inputs must be array<double>.
    * Implemented as the codegen'd [[graft.functions.VecDot]] primitive loop
    * (the HOF formulation below is kept as the executable spec — both
    * produce bit-identical doubles; see SimilaritySpec).
    */
  def dot(a: Column, b: Column): Column = graft.functions.VecExpressions.vecDot(a, b)

  /** Reference formulation: `aggregate(zip_with(a,b,*), 0.0, +)` — same
    * fold order as [[dot]], ~40× slower (lambda interpretation + per-row
    * allocation); used only to cross-check the native kernel.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact float[]→double[] view of an embedding column. */
  def asDouble(c: Column): Column = c.cast("array<double>")

  /** Deterministic ±1 hyperplanes for sign-LSH (random-projection family).
    * Sign of plane j, dim d = bit 16 of Knuth-hash((j*dims+d)) — a fixed,
    * engine-portable pseudo-random sequence (no RNG dependency, same values
    * in any SQL engine via integer arithmetic).
    */
  def signPlanes(nPlanes: Int, dims: Int): Array[Array[Double]] =
    Array.tabulate(nPlanes, dims) { (j, d) =>
      if (((((j * dims + d).toLong * 2654435761L) >> 16) & 1L) == 0L) 1.0 else -1.0
    }

  /** LSH bucket id: bit j set iff dot(emb, plane_j) > 0. */
  def lshBucket(emb: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      val plane = array(p.toSeq.map(lit): _*)
      when(dot(emb, plane) > 0.0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)
}
