package graft.api

import org.apache.spark.sql.{Dataset, Encoder}

/** Partition-parallel BATCHED map — the Scala-side analogue of a vectorized
  * UDF surface (`mapInPandas`-style) for expensive per-record model calls.
  *
  * Row-at-a-time `mapPartitions(_.map(model))` pays the model-invocation
  * overhead (JNI hop, session dispatch, GPU kernel launch, …) once per ROW;
  * production inference amortizes it by handing the model one batch of rows
  * per call. `mapBatches` chunks each partition's iterator into size-bounded
  * batches lazily — only one batch is resident per task at a time, so memory
  * stays `batchSize × row` regardless of partition size, and the operator
  * remains a map-only narrow transformation (no shuffle, no driver hop).
  *
  * The callback receives the whole batch and returns its outputs; callers
  * that want a column-major (columnar) view build it from the batch once per
  * call — see `Multimodal.decodeBatchStub` for the shape.
  */
object BatchUdf {
  def mapBatches[T, U: Encoder](ds: Dataset[T], batchSize: Int)(
      model: Seq[T] => Seq[U]): Dataset[U] = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    ds.mapPartitions(_.grouped(batchSize).flatMap(model))
  }
}
