package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hierarchical-key mapping (SURVEY.md §3.1): the reference addresses
  * entities by ancestor paths — Kind1:id1 / Kind2:id2 / ... [U: reference
  * checkout empty, public Datastore key model]. The Spark-native encoding is
  * a plain string path column `kind/id/kind/id/...`: orderable, groupable,
  * prefix-filterable, and cheap to build/split with codegen'd string
  * expressions (no UDFs).
  *
  * Scale: keys are derived from natural-key columns on the fly (map-only);
  * grouping by an ancestor prefix is an ordinary hash shuffle on a short
  * string. For prefix scans at 100 TB, write the table partitioned or
  * bucketed by the root ancestor id so the prefix predicate prunes.
  */
object KeyOps {
  /** Build `kind/id[/kind/id...]` from alternating (kind, id-column) pairs. */
  def keyPath(pairs: (String, Column)*): Column =
    concat_ws("/", pairs.flatMap { case (kind, id) =>
      Seq(lit(kind), id.cast("string")) }: _*)

  /** The ancestor path one level up (drops the last kind/id pair);
    * NULL-free: a root key's parent is the empty string. */
  def parentPath(key: Column): Column =
    array_join(slice(split(key, "/"), lit(1), size(split(key, "/")) - 2), "/")

  /** Kind name at 0-based `depth` in the path. */
  def kindAt(key: Column, depth: Int): Column =
    element_at(split(key, "/"), depth * 2 + 1)

  /** Numeric id at 0-based `depth` in the path. */
  def idAt(key: Column, depth: Int): Column =
    element_at(split(key, "/"), depth * 2 + 2).cast("long")
}
