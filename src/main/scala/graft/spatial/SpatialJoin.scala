package graft.spatial

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grid-partitioned bounding-box spatial join — the scale path for
  * "points within rectangles" (the reference's backend delegated spatial
  * predicates to PostGIS/Oracle-Spatial server-side, e.g. the ST_*
  * predicates in datum/postgis/table.py; on Spark the standard design is
  * the uniform-grid partitioned join used by every distributed spatial
  * engine built on Spark).
  *
  * Shape: each point hashes to exactly ONE grid cell; each box explodes to
  * the (few) cells its rectangle covers. Candidates come from an EQUI-join
  * on (cx, cy) — shuffle-bounded, never a nested loop — and the exact
  * containment predicate filters candidates afterwards. Because a point
  * lives in one cell, a (point, box) pair can only meet in that one cell:
  * no dedup pass is needed. At 100 TB the cell size is the tuning knob
  * (cells ≈ box size ⇒ each box covers ≤ 4 cells in 2-D); skewed cells
  * (a downtown hot cell) fall out of the same AQE/salting toolbox as any
  * hot join key.
  */
object SpatialJoin {

  /** Join `points(px, py, …)` to `boxes(xmin, xmax, ymin, ymax, …)` on
    * rectangle containment (inclusive bounds). Returns point ⋈ box rows.
    *
    * `cell` should be ≥ the typical box extent so each box covers O(1)
    * cells; correctness does not depend on it.
    */
  def bboxJoin(points: DataFrame, boxes: DataFrame, cell: Int): DataFrame = {
    val p = points
      .withColumn("_cx", floor(col("px") / cell))
      .withColumn("_cy", floor(col("py") / cell))
    val b = boxes
      .withColumn("_cx", explode(sequence(floor(col("xmin") / cell), floor(col("xmax") / cell))))
      .withColumn("_cy", explode(sequence(floor(col("ymin") / cell), floor(col("ymax") / cell))))
    p.join(b, Seq("_cx", "_cy"))
      .filter(col("px") >= col("xmin") && col("px") <= col("xmax") &&
        col("py") >= col("ymin") && col("py") <= col("ymax"))
      .drop("_cx", "_cy")
  }

  /** Bounded nearest-neighbor join: for each point `(pid, px, py)`, the
    * nearest site `(sid, sx, sy)` within `radius` — squared-distance
    * argmin, ties by lower sid. Points hash to ONE grid cell of size
    * `radius`; each site explodes to its 3×3 cell neighborhood, so any
    * (point, site) pair within `radius` provably shares the point's cell
    * (|Δx| ≤ R bounds the cell offset to ±1). Candidates are an equi-join
    * on cell — never a nested loop — and the argmin is a map-side-combined
    * `min(struct(d2, sid))` per point. Distances are exact integer
    * arithmetic (inputs are integral coordinates), so results are
    * bit-identical in any engine at any parallelism. Points with no site
    * inside `radius` are absent (the bounded-kNN contract, same as a
    * tolerance as-of join).
    */
  def nnJoin(points: DataFrame, sites: DataFrame, radius: Int): DataFrame = {
    val p = points
      .withColumn("_cx", floor(col("px") / radius))
      .withColumn("_cy", floor(col("py") / radius))
    val s = sites
      .withColumn("_cx", explode(array((-1 to 1).map(d =>
        floor(col("sx") / radius) + d): _*)))
      .withColumn("_cy", explode(array((-1 to 1).map(d =>
        floor(col("sy") / radius) + d): _*)))
    val d2 = (col("px") - col("sx")) * (col("px") - col("sx")) +
      (col("py") - col("sy")) * (col("py") - col("sy"))
    p.join(s, Seq("_cx", "_cy"))
      .filter(d2 <= lit(radius.toLong * radius))
      .groupBy("pid")
      .agg(min(struct(d2.as("d2"), col("sid"))).as("_nn"))
      .select(col("pid"), col("_nn.sid").as("nn_sid"), col("_nn.d2").as("d2"))
  }
}
