package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession

/** How a model object travels to executor-side expression kernels
  * (round-16 verdict item 5).
  *
  * A plain `ctx.addReferenceObj` serializes the object into the task
  * binary, which every TASK deserializes — per-task cost O(model
  * bytes) × tasks × samples. A Spark broadcast costs one driver-side
  * block write at construction and `value()` materializes the object
  * ONCE per executor JVM. But the broadcast's construction cost
  * (~tens of ms) exceeds the per-task deserialization of a KB-sized
  * model many times over, so the choice is SIZE-GATED:
  *
  *  - models under [[BroadcastThreshold]] ride as direct reference
  *    objects (the bundled sample models — hundreds of bytes — and
  *    any realistic hyperplane/centroid table);
  *  - anything larger (a lid.176-class 126 MB fastText matrix, a
  *    multi-million-piece SentencePiece vocab) is broadcast once and
  *    deserialized once per executor instead of once per task.
  *
  * Both forms produce identical results; only transport differs. */
object ModelRef {

  /** Broadcast models at/above this estimated serialized size (4 MiB:
    * far above every bundled sample, far below the published-model
    * sizes the broadcast exists for; at 4 MiB the per-task
    * deserialization cost starts to rival a task's fixed overhead). */
  val BroadcastThreshold: Long = 4L << 20

  /** Left(model) below the threshold, Right(broadcast) at/above it. */
  def of[T <: AnyRef: scala.reflect.ClassTag](
      model: T, estimatedBytes: Long): Either[T, Broadcast[T]] =
    if (estimatedBytes >= BroadcastThreshold)
      Right(SparkSession.active.sparkContext.broadcast(model))
    else Left(model)

  /** The model, whichever way it traveled. */
  def get[T](ref: Either[T, Broadcast[T]]): T =
    ref.fold(identity, _.value)
}
