package graft.queries

/** Shared CTE prefix for the [[graft.ops.RandomProjection]] oracles:
  * materializes the 16x64 Achlioptas matrix from the same md5
  * "rp:row:col" keys the Spark side hashes driver-side, with the same
  * fixed-width lowercase-hex bucket thresholds (first 8 md5 chars:
  * < 2aaaaaaa → +1, < 55555555 → -1, else 0), as one list-of-lists
  * scalar `mx` (row-major, 1-indexed by [j + 1][i]). */
object RandomProjectionOracle {

  val matrixCtes: String =
    """WITH mat AS MATERIALIZED (SELECT j, i,
      |    CASE WHEN h < '2aaaaaaa' THEN 1.0
      |         WHEN h < '55555555' THEN -1.0 ELSE 0.0 END AS m
      |  FROM (SELECT j, i,
      |      substring(md5('rp:' || j || ':' || i), 1, 8) AS h
      |    FROM range(16) r1(j), range(64) r2(i))),
      |mrow AS (SELECT j, list(m ORDER BY i) AS mr FROM mat GROUP BY j),
      |mm AS (SELECT list(mr ORDER BY j) AS mx FROM mrow)""".stripMargin
}
