package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** GeoPoint mapping (SURVEY.md §3.1): the reference's GeoPoint property [U]
  * maps to two plain double columns (lat, lon) — struct them if a single
  * column is wanted; all math stays in codegen'd built-ins (no UDFs).
  *
  * Scale: `haversineKm` is map-only. Spatial *joins* at 100 TB use
  * `cellId` as a coarse grid bucket: co-shuffle both sides on the cell
  * (plus neighbor cells for radius queries) so candidate pairs are
  * bucket-local — the same candidate-pruning shape as the LSH/IVF
  * similarity paths, with geography as the hash function.
  */
object GeoOps {
  val EarthRadiusKm = 6371.0088

  /** Great-circle distance in km (haversine; inputs in degrees). */
  def haversineKm(lat1: Column, lon1: Column,
      lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val a = pow(sin(dLat), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2)
    lit(2 * EarthRadiusKm) * asin(sqrt(a))
  }

  /** Deterministic grid-cell id for a (lat, lon) at `cellDeg` resolution:
    * row-major over a [-90,90]×[-180,180] grid. Long-typed so it shuffles
    * as 8 bytes. */
  def cellId(lat: Column, lon: Column, cellDeg: Double): Column = {
    val cols = math.ceil(360.0 / cellDeg).toLong
    (floor((lat + lit(90.0)) / lit(cellDeg)).cast("long") * lit(cols) +
      floor((lon + lit(180.0)) / lit(cellDeg)).cast("long"))
  }
}
