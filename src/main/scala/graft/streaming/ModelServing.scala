package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.llm.QualityClassifier

/** Model serving at ingest — the deployment half of the CCNet/FineWeb
  * quality-filter pattern: the Rocchio model is TRAINED on a batch
  * corpus (llm.QualityClassifier, the llm_quality_classifier contract)
  * and FROZEN; arriving documents are then scored map-side by folding
  * their token stream against the broadcast weight table
  * (QualityClassifier.scoreCol — codegen'd builtins, no explode, no
  * shuffle, no state store). Train-batch / score-at-ingest is the same
  * static-model split VectorStreams uses for the IVF quantizer, and it
  * keeps the scoring stage STATELESS: filter throughput scales with
  * input partitions alone, and the model swap is a config push, not a
  * state migration.
  *
  * Equivalence contract (StreamingSpec + the stream_quality_score
  * oracle): on a finite replayed file source the emitted rows are
  * EXACTLY `QualityClassifier.train(batch)` — token fold ≡ feature
  * join by commutativity of Long addition, same threshold.
  */
object ModelServing {

  /** Score a document stream under a frozen model: (doc_id, label,
    * score, pred). `labelCol` is the weak-label rule carried through
    * for evaluation parity with the training output.
    */
  def scoreDocuments(stream: DataFrame,
      model: QualityClassifier.RocchioModel, labelCol: Column): DataFrame =
    stream.select(col("doc_id").cast("long").as("doc_id"),
        labelCol.cast("long").as("label"),
        QualityClassifier.scoreCol(model, col("text")).as("score"))
      .withColumn("pred",
        when(col("score") > model.tau, 1L).otherwise(0L))
}
