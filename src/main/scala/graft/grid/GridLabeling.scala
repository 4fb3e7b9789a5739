package graft.grid

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected-component patch labeling over a binary pixel plane — the
  * "alert pixels → alert patches" product the reference's downstream
  * consumer publishes (Terra-i-style alert polygons): group 4-connected
  * detection pixels into patches with stable ids, then summarize each
  * patch (area, bbox, centroid) for the vector/alert sink.
  *
  * Distributed two-level CCL (the classic block-wise scheme, expressed
  * Spark-first):
  *
  *  1. pixels group by their CHUNK; each chunk runs a local union-find
  *     and emits per-pixel provisional labels = the min global pixel id
  *     (y·width + x) of the local component. One pixel-keyed shuffle,
  *     per-group work linear in chunk pixels.
  *  2. components touching a chunk border meet their neighbors through
  *     BORDER-PIXEL adjacency edges — two self-equi-joins (right and
  *     down across the border), so the join input is perimeter-sized,
  *     never the full plane.
  *  3. the label-equivalence graph is COMPONENT-sized, not pixel-sized
  *     (one node per border-touching local component); it collects to a
  *     driver union-find (union-by-min, the SkewTools bounded-collect
  *     discipline — guarded by `maxBoundaryEdges`) and the root map
  *     broadcast-joins back.
  *
  * The final `patch_id` is the min global pixel id of the whole
  * component — deterministic, engine-replayable (the DuckDB oracle
  * computes the same min-label closure recursively).
  */
object GridLabeling {

  /** Label 4-connected components of `on` (a DataFrame with integer
    * x, y columns, one row per "on" pixel, e.g. a thresholded or
    * alarm-flagged plane). Returns (x, y, patch_id). */
  def labelPatches(spark: SparkSession, header: GridHeader, on: DataFrame,
                   maxBoundaryEdges: Int = 10000000): DataFrame = {
    import spark.implicits._
    val width = header.width
    val fw = header.fracWidth
    val fh = header.fracHeight
    val px = on.select(col("x").cast("int"), col("y").cast("int"))
    // 1. chunk-local union-find, labels = min global pixel id
    val local = px.as[(Int, Int)]
      .groupByKey { case (x, y) => (x / fw, y / fh) }
      .flatMapGroups { (_, it) =>
        val pts = it.toArray
        val idx = scala.collection.mutable.LongMap.empty[Int]
        var i = 0
        while (i < pts.length) {
          idx.update(pts(i)._2.toLong * width + pts(i)._1, i); i += 1
        }
        val parent = Array.tabulate(pts.length)(identity)
        def find(a: Int): Int = {
          var r = a
          while (parent(r) != r) r = parent(r)
          var c = a
          while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        def union(a: Int, b: Int): Unit = {
          val ra = find(a); val rb = find(b)
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        i = 0
        while (i < pts.length) {
          val (x, y) = pts(i)
          // left / up neighbors INSIDE the same chunk
          if (x % fw != 0)
            idx.get(y.toLong * width + (x - 1)).foreach(union(i, _))
          if (y % fh != 0)
            idx.get((y - 1).toLong * width + x).foreach(union(i, _))
          i += 1
        }
        // component label = min pixel id over members (min-INDEX roots
        // are not min PIXEL ids — resolve by an explicit min pass)
        val minPid = scala.collection.mutable.LongMap.empty[Long]
        i = 0
        while (i < pts.length) {
          val r = find(i).toLong
          val pid = pts(i)._2.toLong * width + pts(i)._1
          if (pid < minPid.getOrElse(r, Long.MaxValue)) minPid.update(r, pid)
          i += 1
        }
        pts.indices.iterator.map { k =>
          (pts(k)._1, pts(k)._2, minPid(find(k).toLong))
        }
      }.toDF("x", "y", "label")
    val cached = local.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // 2. cross-border adjacency: (label, label) edges. BOTH join
      // sides filter to their border column/row first, so the equi-join
      // shuffles perimeter-sized streams — the full label table never
      // re-shuffles (a join against the unfiltered table would move
      // every pixel to probe a 1/fracWidth sliver)
      val right = cached.filter(pmod(col("x"), lit(fw)) === fw - 1)
        .select((col("x") + 1).as("x"), col("y"), col("label").as("la"))
        .join(cached.filter(pmod(col("x"), lit(fw)) === 0), Seq("x", "y"))
        .select(col("la"), col("label").as("lb"))
      val down = cached.filter(pmod(col("y"), lit(fh)) === fh - 1)
        .select(col("x"), (col("y") + 1).as("y"), col("label").as("la"))
        .join(cached.filter(pmod(col("y"), lit(fh)) === 0), Seq("x", "y"))
        .select(col("la"), col("label").as("lb"))
      val edges = right.unionByName(down)
        .filter(col("la") =!= col("lb")).distinct()
        .as[(Long, Long)].head(maxBoundaryEdges + 1)
      require(edges.length <= maxBoundaryEdges,
        s"boundary-component graph exceeds $maxBoundaryEdges edges; " +
          "raise maxBoundaryEdges or label in tiles")
      // 3. driver union-find over the component graph, union-by-min
      val root = scala.collection.mutable.LongMap.empty[Long]
      def find(a: Long): Long = {
        var r = a
        while (root.getOrElse(r, r) != r) r = root(r)
        var c = a
        while (root.getOrElse(c, c) != r) {
          val n = root(c); root.update(c, r); c = n
        }
        r
      }
      edges.foreach { case (a, b) =>
        val ra = find(a); val rb = find(b)
        if (ra != rb) root.update(math.max(ra, rb), math.min(ra, rb))
      }
      val entries = root.keys.toArray.map(k => (k, find(k)))
      if (entries.isEmpty)
        cached.select(col("x"), col("y"), col("label").as("patch_id"))
      else {
        val m = entries.toSeq.toDF("label", "patch_root")
        cached.join(broadcast(m), Seq("label"), "left")
          .select(col("x"), col("y"),
            coalesce(col("patch_root"), col("label")).as("patch_id"))
      }
    } finally {
      // the returned plan references `cached`; register for the
      // caller's post-action release instead of unpersisting live
      graft.ops.CacheRegistry.track(cached)
    }
  }

  /** Per-patch summary for the alert sink: area, bbox, centroid (exact
    * integer sums → one divide). One partial-agg shuffle on patch_id. */
  def patchStats(labeled: DataFrame): DataFrame =
    labeled.groupBy(col("patch_id"))
      .agg(count(lit(1)).as("n_px"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"),
        (sum(col("x")).cast("double") / count(lit(1))).as("cx"),
        (sum(col("y")).cast("double") / count(lit(1))).as("cy"))
}
