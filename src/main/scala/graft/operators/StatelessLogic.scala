package graft.operators

import org.apache.spark.sql.{Dataset, Encoder}

/** Custom stateless operator logic — Spark-native re-expression of
  * malstrom's `StatelessLogic` (reference: malstrom-core/src/operators/
  * stateless_op.rs; examples/custom_stateless_operator.rs): a per-record
  * 0..n transform with no keyed state.
  *
  * Note: prefer Column expressions (GraftStream.map/filter/filterMap) when
  * the logic is expressible — they stay in whole-stage codegen. This typed
  * path exists for genuinely imperative record logic (the reference's
  * escape hatch, same as its `stateless_op`). Epoch handling (`on_epoch`)
  * needs no analogue: Spark's watermark machinery forwards event-time
  * progress independently of user code.
  */
trait StatelessLogic[V, O] extends Serializable {
  /** Emit zero or more outputs for one input record. */
  def onData(value: V): IterableOnce[O]
}

object StatelessExec {
  /** Works identically for batch Datasets and streaming Datasets. */
  def run[V, O: Encoder](ds: Dataset[V], logic: StatelessLogic[V, O]): Dataset[O] =
    ds.flatMap(v => logic.onData(v))(implicitly[Encoder[O]])
}
