package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection: reduce an embedding column to
  * `outDim` components with a deterministic ±1/√outDim sign matrix — the
  * standard preprocessing step before indexing when the native dimension
  * is too wide (JL: pairwise distances are preserved within ε for
  * outDim = O(log n / ε²); sign matrices are the Achlioptas variant that
  * needs no Gaussian sampling).
  *
  * Scale shape: the matrix is k×d driver-side constants folded into the
  * plan as literals (like the k-means codebooks), and each output
  * component is a `zip_with`/`aggregate` dot product over the row's own
  * vector — a single projection at scan speed, ZERO shuffles, no matrix
  * broadcast needed. Determinism comes from deriving each sign from
  * MD5(seed:j:i), so any engine (and the test oracle) can rebuild the
  * identical matrix.
  */
object RandomProjection {

  /** Sign of matrix entry (j, i): +1 when the top bit of
    * MD5("seed:j:i") is 0, else −1 — uniform, independent, reproducible.
    */
  private def signAt(seed: Long, j: Int, i: Int): Double = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed:$j:$i".getBytes("UTF-8"))
    if ((h(0) & 0x80) == 0) 1.0 else -1.0
  }

  /** The full `outDim × inDim` projection matrix, entries ±1/√outDim. */
  def matrix(seed: Long, outDim: Int, inDim: Int): Array[Array[Double]] = {
    require(outDim > 0 && inDim > 0, "dims must be > 0")
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    Array.tabulate(outDim)(j => Array.tabulate(inDim)(i => signAt(seed, j, i) * scale))
  }

  /** Project `vecCol` (length `inDim`) to `outDim` components; returns
    * `(vec_id, projected array<double>)`.
    */
  def project(
      df: DataFrame,
      idCol: Column,
      vecCol: Column,
      inDim: Int,
      outDim: Int,
      seed: Long = 42L): DataFrame = {
    val m = matrix(seed, outDim, inDim)
    val v = vecCol.cast("array<double>")
    val comps = m.map { row =>
      aggregate(
        zip_with(v, typedlit(row.toSeq), (a, b) => a * b),
        lit(0.0), (acc, x) => acc + x)
    }
    df.select(idCol.as("vec_id"), array(comps: _*).as("projected"))
  }
}
