package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupStateTimeout, OutputMode, Trigger}

import graft.pipeline.{Pipeline, Routing, RoutedMessages}

/** Structured Streaming surface of the engine.
  *
  * The reference's whole data plane is one streaming job per pipeline:
  * Kafka source → decode → processor chain → DLQ/target routing → Kafka
  * sink, at-least-once via produce-then-commit (reference
  * src/consumer.js:153-175,239-254). Structured Streaming gives the same
  * contract with checkpointing; the Column-expression chain compiled by
  * [[graft.pipeline.Pipeline]] is source-agnostic, so the exact same plan
  * fragment runs over `read` and `readStream`.
  */
object StreamingOps {

  /** Kafka streaming source with the reference's consumer tuning mapped
    * onto Spark options (reference src/consumer.js:198-221):
    * fromBeginning → startingOffsets=earliest; batchSize 5000 →
    * maxOffsetsPerTrigger; minPartitions decouples Spark parallelism from
    * topic partitions (what the reference needed a partition-scaler
    * sidecar for, partition-scaler.js:72-77).
    */
  def kafkaSource(spark: org.apache.spark.sql.SparkSession, brokers: String,
      topic: String, maxOffsetsPerTrigger: Long = 5000,
      minPartitions: Option[Int] = None): DataFrame = {
    val r = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .option("maxOffsetsPerTrigger", maxOffsetsPerTrigger)
    minPartitions.fold(r)(n => r.option("minPartitions", n)).load()
  }

  /** Run a compiled pipeline over a streaming message frame
    * (key/value/num columns) and shape the output for a Kafka sink:
    * per-row `topic` column routes target vs DLQ in ONE sink — the
    * distributed replacement for the reference's per-message DLQ sends
    * (src/consumer.js:166-172). Dropped/error rows are filtered (the
    * reference produces them nowhere, src/consumer.js:134-150).
    */
  def routeForKafka(pipeline: Pipeline, messages: DataFrame,
      encodeValue: DataFrame => Column): DataFrame =
    pipeline(messages).kafkaShape(encodeValue)

  /** Kafka sink writer with checkpointing — at-least-once, matching the
    * reference's produce-before-commit contract.
    */
  def kafkaSink(routed: DataFrame, brokers: String,
      checkpointDir: String): DataStreamWriter[Row] =
    routed.writeStream.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("checkpointLocation", checkpointDir)

  /** Tumbling-window aggregate with watermark — the north-star streaming
    * aggregation the reference lacks entirely (SURVEY §2.3).
    */
  def tumblingCounts(events: DataFrame, tsCol: String, width: String,
      watermark: String, groupCols: Seq[String],
      sumCol: Option[String] = None): DataFrame = {
    // the summed measure is opt-in like every other column here — a
    // hardcoded sum("value") would fail analysis on frames without one
    val aggs = count(lit(1)).as("n") +:
      sumCol.map(c => sum(col(c)).as(s"sum_$c")).toSeq
    events.withWatermark(tsCol, watermark)
      .groupBy((window(col(tsCol), width) +: groupCols.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select((col("window.start").as("window_start") +: groupCols.map(col)) ++
        Seq(col("n")) ++ sumCol.map(c => col(s"sum_$c")): _*)
  }

  /** Sliding-window aggregate: each event contributes to width/slide
    * overlapping windows (Spark explodes the assignment inside the
    * aggregation — no self-join).
    */
  def slidingCounts(events: DataFrame, tsCol: String, width: String,
      slide: String, watermark: String, groupCols: Seq[String]): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy((window(col(tsCol), width, slide) +: groupCols.map(col)): _*)
      .agg(count(lit(1)).as("n"))
      .select((col("window.start").as("window_start") +:
        groupCols.map(col)) :+ col("n"): _*)

  /** Stream-static enrichment join: the static dimension is broadcast to
    * every task, so the stream never shuffles — the Spark-native version
    * of the reference's driver-side catalog caches (consumer.js:55,74)
    * applied to data-plane enrichment. Works identically over batch.
    */
  def enrich(stream: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    stream.join(broadcast(dim), keys, "left")

  /** Session windows with a gap — stateful sessionization. */
  def sessionAgg(events: DataFrame, tsCol: String, gap: String,
      watermark: String, keyCol: String): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col(keyCol), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n"))

  /** Streaming exact dedup within a watermark horizon — bounded state:
    * Spark evicts keys older than the watermark, so state stays
    * proportional to the horizon, not the stream history.
    */
  def streamingDedup(events: DataFrame, tsCol: String, watermark: String,
      keyCols: Seq[String]): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Continuous-ingestion near-dup: each micro-batch probes the parquet
    * MinHash index of everything ingested before it
    * ([[graft.operators.Dedup.minhashLshIncrementalFromIndex]]), appends
    * the resulting new-involving pairs, then appends its own index rows
    * so later batches match against it. The corpus text is read exactly
    * once, ever; the accumulated state is the (id, band, sig, shingles)
    * index on disk — restart-safe and corpus-sized on storage, never in
    * executor memory.
    *
    * Both writes are partitioned by batch id with dynamic partition
    * overwrite, so a replayed batch (at-least-once foreachBatch)
    * replaces its own partition instead of duplicating rows —
    * effectively exactly-once output.
    */
  def continuousNearDup(docs: DataFrame, idCol: String, textCol: String,
      indexPath: String, pairsPath: String, checkpoint: String,
      numHashes: Int = 16, bands: Int = 8, shingleN: Int = 5,
      threshold: Double = 0.5, estimateSlack: Double = 0.25): DataStreamWriter[Row] = {
    import graft.operators.Dedup
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        // persist (not localCheckpoint): compute the batch index once for
        // both the probe and the index write, with a handle we can release
        // — checkpointed blocks would accumulate on executors for the
        // stream's lifetime
        val newIdx = Dedup.minhashIndex(batch.toDF(), idCol, textCol,
          numHashes, bands, shingleN)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          newIdx.count() // eager, like localCheckpoint(true) was
          val existing =
            try spark.read.parquet(indexPath)
              // a replayed batch must not see its own failed attempt's rows
              .where(col("batch_id") =!= batchId).drop("batch_id")
            catch {
              // ONLY path-not-found means "first batch: nothing ingested
              // yet" — any other analysis error (schema mismatch, an index
              // written without batch_id partitions) must surface, not
              // silently empty the corpus
              case e: org.apache.spark.sql.AnalysisException
                  if e.getCondition == "PATH_NOT_FOUND" => newIdx.limit(0)
            }
          val pairs = Dedup.minhashLshIncrementalFromIndex(newIdx, idCol,
            existing, numHashes, threshold, estimateSlack)
          def writeBatch(df: DataFrame, path: String): Unit = df
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(path)
          writeBatch(pairs, pairsPath)
          writeBatch(newIdx, indexPath)
        } finally newIdx.unpersist(blocking = false)
        ()
      }
  }

  /** Continuous quality scoring against a persisted Naive Bayes model
    * ([[graft.operators.Classifier.nbTrain]] output, read back from
    * parquet): each micro-batch is scored with
    * [[graft.operators.Classifier.nbScore]] and written per-batch-id
    * (dynamic overwrite — replays replace). The model is STATIC for the
    * stream's lifetime — the standard train-offline / score-online
    * split; retraining is a new model path and a stream restart. Scoring
    * is a vocabulary-table join + one per-doc aggregation per batch;
    * nothing stateful accumulates.
    */
  def continuousNbScore(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame, outPath: String, checkpoint: String)
      : DataStreamWriter[Row] =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        graft.operators.Classifier
          .nbScore(batch.toDF(), idCol, textCol, model)
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(outPath)
        ()
      }

  /** Continuous domain-relevance scoring against a persisted DSIR model
    * ([[graft.operators.Sampling.dsirTrain]] output, read back from
    * parquet): each micro-batch is scored with
    * [[graft.operators.Sampling.dsirScore]] and written per-batch-id
    * (dynamic overwrite — replays replace). Same train-offline /
    * score-online split as [[continuousNbScore]]; the model is a
    * bucket-bounded broadcast per batch, nothing stateful accumulates.
    * Downstream, a threshold on `logw` is the online keep/drop gate.
    */
  def continuousDsirScore(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame, numBuckets: Int, outPath: String, checkpoint: String)
      : DataStreamWriter[Row] =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        graft.operators.Sampling
          .dsirScore(batch.toDF(), idCol, textCol, model, numBuckets)
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(outPath)
        ()
      }

  /** Continuous realization of a static mixture plan
    * ([[graft.operators.Sampling.mixturePlan]] output, read back from
    * parquet): each micro-batch of raw docs is materialized through
    * [[graft.operators.Sampling.applyMixturePlan]] — floor-epochs full
    * repeats + the md5-deterministic fractional remainder, `epoch_idx`
    * per copy — and lands per-batch-id (dynamic overwrite — replays
    * replace). Because the emission rule is a pure per-row function of
    * (id, source, plan), the union of the per-batch outputs EQUALS the
    * batch materialization of the union: ingestion batching is
    * invisible to the realized mixture. Same train-offline /
    * apply-online split as NB / DSIR / k-means scoring; re-planning is a
    * new plan path and a stream restart.
    */
  def continuousApplyMixturePlan(docs: DataFrame, sourceCol: String,
      idCol: String, plan: DataFrame, outPath: String, checkpoint: String)
      : DataStreamWriter[Row] =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        graft.operators.Sampling
          .applyMixturePlan(batch.toDF(), sourceCol, idCol, plan)
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(outPath)
        ()
      }

  /** Continuous topic-shard assignment against a persisted k-means
    * model ([[graft.operators.Embeddings.kmeansTrain]] output): each
    * micro-batch labels via [[graft.operators.Embeddings.kmeansAssign]]
    * — one shuffle-free projection per batch against the k-row model —
    * and lands per-batch-id (dynamic overwrite — replays replace). Same
    * train-offline / score-online split as NB and DSIR.
    */
  def continuousKmeansAssign(vecs: DataFrame, idCol: String, vecCol: String,
      model: DataFrame, outPath: String, checkpoint: String)
      : DataStreamWriter[Row] =
    vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        graft.operators.Embeddings
          .kmeansAssign(batch.toDF(), idCol, vecCol, model)
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(outPath)
        ()
      }

  /** [[continuousKmeansAssign]] for a persisted
    * [[graft.operators.Sampling.kCenterCenters]] coreset: each
    * micro-batch routes into the FROZEN k-center regions
    * ([[graft.operators.Sampling.kCenterAssign]]'s exact argmin, shared
    * code — ties to the earliest-chosen center), landing per-batch-id
    * with dynamic overwrite (replay-safe). The streaming half of the
    * diversity sampler's train-offline / score-online split: the
    * traversal is inherently sequential and runs offline, the stream
    * only ever scores. Coreset drift → re-traverse offline, swap the
    * centers table, restart.
    */
  def continuousKCenterAssign(vecs: DataFrame, idCol: String,
      vecCol: String, centers: DataFrame, outPath: String,
      checkpoint: String): DataStreamWriter[Row] =
    vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        graft.operators.Sampling
          .kCenterAssign(batch.toDF(), idCol, vecCol, centers)
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(outPath)
        ()
      }

  /** Continuous per-group quality cap — the streaming face of
    * [[graft.operators.Sampling.capPerGroup]] ("keep at most `n` best
    * docs per domain"), same persisted-state discipline as the dedup
    * families: the best-so-far SELECTED SET (≤ n rows per group:
    * group cols + id + score) persists in parquet; each micro-batch
    * unions its candidates with the latest committed set, re-caps with
    * the batch operator (bounded top-k aggregation — never a per-group
    * window), and writes the new set at its own `batch_id` partition
    * (dynamic overwrite — replays replace). The previous batch's
    * partition is kept (a replay of batch B must find B−1's state);
    * older ones are pruned, so state on disk is ≤ 2 × #groups × n rows.
    *
    * Invariant (spec-checked): after any prefix of batches, the
    * selection equals `capPerGroup` over the union of those batches —
    * holds because top-n-by-score is an associative fold: the best n of
    * (best-so-far ∪ batch) = best n of all rows seen.
    */
  def continuousCapPerGroup(docs: DataFrame, groupCols: Seq[String],
      idCol: String, scoreCol: String, n: Int, statePath: String,
      checkpoint: String): DataStreamWriter[Row] =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val cols = groupCols ++ Seq(idCol, scoreCol)
        val cur = batch.toDF().select(cols.map(col): _*)
        val prev =
          try {
            val all = spark.read.parquet(statePath)
              .where(col("batch_id") =!= batchId)
            val mb = all.agg(max(col("batch_id"))).head.get(0)
            if (mb == null) cur.limit(0)
            else all.where(col("batch_id") === mb.toString.toLong)
              .select(cols.map(col): _*)
          } catch {
            case e: org.apache.spark.sql.AnalysisException
                if e.getCondition == "PATH_NOT_FOUND" => cur.limit(0)
          }
        // distinct: a row present in the carried state AND re-sent in
        // this batch must occupy one top-k slot, not two
        val best = graft.operators.Sampling.capPerGroup(
          prev.union(cur).distinct(), groupCols, idCol, col(scoreCol), n)
        best.withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(statePath)
        // prune everything older than the previous committed batch (the
        // replay margin) — see pruneBatchPartitions for the crash story
        pruneBatchPartitions(spark, statePath, keep = Set(batchId, batchId - 1))
        ()
      }

  /** The current selection of a [[continuousCapPerGroup]] state table:
    * the latest batch's partition (older partitions exist only as the
    * replay safety margin).
    */
  def currentCapSelection(spark: org.apache.spark.sql.SparkSession,
      statePath: String): DataFrame = {
    val all = spark.read.parquet(statePath)
    val mb = all.agg(max(col("batch_id"))).head.get(0).toString.toLong
    all.where(col("batch_id") === mb).drop("batch_id")
  }

  /** Continuous per-group distinct counting via MERGEABLE sketches —
    * the streaming face of `q_hll_merge`'s contract: the per-group
    * DataSketches HLL sketch (a fixed-size binary) persists per
    * batch_id; each micro-batch sketches its own rows
    * (`hll_sketch_agg`) and unions them into the carried sketches
    * (`hll_union_agg`) — state is #groups × sketch bytes FOREVER,
    * independent of how many distinct values streamed through, and
    * history is never re-scanned. Same replace-per-batch /
    * replay-margin discipline as [[continuousCapPerGroup]].
    */
  def continuousDistinctSketch(rows: DataFrame, groupCols: Seq[String],
      valueCol: String, statePath: String, checkpoint: String)
      : DataStreamWriter[Row] =
    rows.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val cur = batch.toDF().groupBy(groupCols.map(col): _*)
          .agg(hll_sketch_agg(col(valueCol)).as("sk"))
        val prev =
          try {
            val all = spark.read.parquet(statePath)
              .where(col("batch_id") =!= batchId)
            val mb = all.agg(max(col("batch_id"))).head.get(0)
            if (mb == null) cur.limit(0)
            else all.where(col("batch_id") === mb.toString.toLong)
              .select((groupCols :+ "sk").map(col): _*)
          } catch {
            case e: org.apache.spark.sql.AnalysisException
                if e.getCondition == "PATH_NOT_FOUND" => cur.limit(0)
          }
        prev.union(cur)
          .groupBy(groupCols.map(col): _*)
          .agg(hll_union_agg(col("sk")).as("sk"))
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(statePath)
        pruneBatchPartitions(spark, statePath, keep = Set(batchId, batchId - 1))
        ()
      }

  /** Current per-group distinct estimates of a
    * [[continuousDistinctSketch]] state table.
    */
  def currentDistinctEstimates(spark: org.apache.spark.sql.SparkSession,
      statePath: String, groupCols: Seq[String]): DataFrame = {
    val all = spark.read.parquet(statePath)
    val mb = all.agg(max(col("batch_id"))).head.get(0).toString.toLong
    all.where(col("batch_id") === mb)
      .select(groupCols.map(col) :+
        hll_sketch_estimate(col("sk")).as("n_distinct_est"): _*)
  }

  /** Continuous per-group DISTINCT-WITH-SET-ALGEBRA tracking via the
    * KMV theta sketch ([[graft.functions.ThetaSketch]]) — the
    * set-algebra sibling of [[continuousDistinctSketch]] (HLL can union
    * but never intersect), same replace-per-batch / replay-margin
    * discipline: each micro-batch sketches its own rows and union-merges
    * them into the carried per-group sketches; state is #groups × ≤k
    * longs FOREVER. The KMV canonical form (k smallest distinct hashes
    * of the value SET) means the carried state after N batches is
    * EXACTLY the sketch of the union of all N batches — so persisted
    * per-group sketches answer cross-group overlap questions
    * ([[graft.functions.ThetaSketch.thetaIntersect]] / `thetaJaccard`)
    * at any point in the stream's life, byte-identical to a batch
    * rebuild.
    */
  def continuousThetaSketch(rows: DataFrame, groupCols: Seq[String],
      valueCol: String, statePath: String, checkpoint: String,
      k: Int = 256): DataStreamWriter[Row] = {
    import graft.functions.{ThetaSketch => TS}
    rows.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val cur = batch.toDF().groupBy(groupCols.map(col): _*)
          .agg(TS.thetaSketch(col(valueCol), k).as("sk"))
        val prev =
          try {
            val all = spark.read.parquet(statePath)
              .where(col("batch_id") =!= batchId)
            val mb = all.agg(max(col("batch_id"))).head.get(0)
            if (mb == null) cur.limit(0)
            else all.where(col("batch_id") === mb.toString.toLong)
              .select((groupCols :+ "sk").map(col): _*)
          } catch {
            case e: org.apache.spark.sql.AnalysisException
                if e.getCondition == "PATH_NOT_FOUND" => cur.limit(0)
          }
        prev.union(cur)
          .groupBy(groupCols.map(col): _*)
          .agg(TS.thetaUnion(col("sk"), k).as("sk"))
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(statePath)
        pruneBatchPartitions(spark, statePath, keep = Set(batchId, batchId - 1))
        ()
      }
  }

  /** Continuous per-group QUANTILE tracking via the engine's mergeable
    * quantile sketch ([[graft.functions.QuantileSketch]]) — the quantile
    * sibling of [[continuousDistinctSketch]], same replace-per-batch /
    * replay-margin discipline: each micro-batch sketches its own rows
    * and merges them into the carried per-group sketches; state is
    * #groups × ≤bins buckets FOREVER, history never re-scanned. The
    * sketch's canonical form means the carried state after N batches is
    * EXACTLY the sketch of the union of all N batches — restart, replay,
    * and batch/stream parity are all byte-identical, not approximately
    * equal.
    */
  def continuousQuantileSketch(rows: DataFrame, groupCols: Seq[String],
      valueCol: String, statePath: String, checkpoint: String,
      bins: Int = 256): DataStreamWriter[Row] = {
    import graft.functions.{QuantileSketch => QS}
    rows.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val cur = batch.toDF().groupBy(groupCols.map(col): _*)
          .agg(QS.sketchAgg(col(valueCol).cast("double"), bins).as("sk"))
        val prev =
          try {
            val all = spark.read.parquet(statePath)
              .where(col("batch_id") =!= batchId)
            val mb = all.agg(max(col("batch_id"))).head.get(0)
            if (mb == null) cur.limit(0)
            else all.where(col("batch_id") === mb.toString.toLong)
              .select((groupCols :+ "sk").map(col): _*)
          } catch {
            case e: org.apache.spark.sql.AnalysisException
                if e.getCondition == "PATH_NOT_FOUND" => cur.limit(0)
          }
        prev.union(cur)
          .groupBy(groupCols.map(col): _*)
          .agg(QS.sketchMerge(col("sk"), bins).as("sk"))
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(statePath)
        pruneBatchPartitions(spark, statePath, keep = Set(batchId, batchId - 1))
        ()
      }
  }

  /** Current per-group quantile estimates of a
    * [[continuousQuantileSketch]] state table, one output column per
    * requested probability (`p50`-style names from the rounded
    * percentage).
    */
  def currentQuantileEstimates(spark: org.apache.spark.sql.SparkSession,
      statePath: String, groupCols: Seq[String],
      probs: Seq[Double]): DataFrame = {
    import graft.functions.{QuantileSketch => QS}
    val all = spark.read.parquet(statePath)
    val mb = all.agg(max(col("batch_id"))).head.get(0).toString.toLong
    all.where(col("batch_id") === mb)
      .select(groupCols.map(col) :+ col("sk") :+ col("sk.n").as("n_values"): _*)
      .select(groupCols.map(col) ++ Seq(col("n_values")) ++ probs.map(p =>
        QS.sketchQuantile(col("sk"), p)
          .as(s"p${math.round(p * 100)}")): _*)
  }

  /** Continuous N-step funnel — the streaming face of
    * [[graft.operators.Funnel]]: the per-user reach frame
    * (user, t_1 .. t_N) persists per batch_id (same
    * dynamic-overwrite/replay-margin/prune discipline as
    * [[continuousCapPerGroup]]); each micro-batch REPLAYS the carried
    * state as synthetic step events (one event of step i's type at t_i
    * per reached user — exactly the information the chained min-agg
    * needs) unioned with the batch's events, and recomputes
    * [[graft.operators.Funnel.reach]] over that union. State is
    * #reached-users × N timestamps — user-bounded, not event-bounded.
    *
    * CONTRACT (the standard event-time streaming assumption): each
    * user's events arrive in non-decreasing `ts` order ACROSS batches
    * (within a batch, any order — reach computes exactly). An event
    * arriving after a later-ts event of the same user may be chained
    * against already-frozen step times, like a closed window: e.g. a
    * step-1 event arriving after the user's step-2 event was discarded
    * cannot resurrect it. Under in-order arrival the spec-checked
    * invariant holds: after any prefix of batches, the state equals
    * `Funnel.reach` over the union of those batches.
    */
  def continuousFunnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String], conversionWindow: Option[String],
      statePath: String, checkpoint: String): DataStreamWriter[Row] =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val cur = batch.toDF().select(col(userCol), col(typeCol), col(tsCol))
        val emptyState = graft.operators.Funnel.reach(
          cur.limit(0), userCol, typeCol, tsCol, steps, conversionWindow)
        val prev =
          try {
            val all = spark.read.parquet(statePath)
              .where(col("batch_id") =!= batchId)
            val mb = all.agg(max(col("batch_id"))).head.get(0)
            if (mb == null) emptyState
            else all.where(col("batch_id") === mb.toString.toLong)
              .select(emptyState.columns.map(col): _*)
          } catch {
            case e: org.apache.spark.sql.AnalysisException
                if e.getCondition == "PATH_NOT_FOUND" => emptyState
          }
        val synth = steps.indices.map { i =>
          prev.filter(col(s"t_${i + 1}").isNotNull)
            .select(col(userCol), lit(steps(i)).as(typeCol),
              col(s"t_${i + 1}").as(tsCol))
        }.reduce(_ union _)
        val merged = graft.operators.Funnel.reach(
          synth.union(cur), userCol, typeCol, tsCol, steps, conversionWindow)
        merged.withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(statePath)
        pruneBatchPartitions(spark, statePath, keep = Set(batchId, batchId - 1))
        ()
      }

  /** The current per-user reach frame of a [[continuousFunnel]] state
    * table (latest batch partition).
    */
  def currentFunnelReach(spark: org.apache.spark.sql.SparkSession,
      statePath: String): DataFrame = {
    val all = spark.read.parquet(statePath)
    val mb = all.agg(max(col("batch_id"))).head.get(0).toString.toLong
    all.where(col("batch_id") === mb).drop("batch_id")
  }

  /** The funnel headline over the current stream state — the same
    * one-row (n_step_1 .. n_step_N) shape as
    * [[graft.operators.Funnel.counts]], read from [[currentFunnelReach]].
    */
  def currentFunnelCounts(spark: org.apache.spark.sql.SparkSession,
      statePath: String, nSteps: Int): DataFrame = {
    require(nSteps >= 1, "nSteps must be positive")
    currentFunnelReach(spark, statePath).agg(
      count(col("t_1")).as("n_step_1"),
      (2 to nSteps).map(i => count(col(s"t_$i")).as(s"n_step_$i")): _*)
  }

  /** Continuous SCD2 dimension maintenance — the CDC-stream face of
    * [[graft.operators.Scd2]]: each micro-batch of attribute
    * observations folds into a persisted version history WITHOUT
    * rewriting it. Closed versions are immutable under the in-order
    * contract (each key's observations arrive in non-decreasing ts
    * order across batches — same contract as [[continuousFunnel]]), so
    * a batch can only (a) CLOSE a key's current version and (b) open
    * new versions. The batch therefore writes an append-only DELTA:
    * for each key the batch touches, the current version row is
    * replayed as a synthetic observation through `Scd2.history`
    * together with the batch's updates, and the resulting rows land at
    * this batch_id — the labels-delta discipline
    * ([[continuousClusteredDedup]]): the live row of a (key,
    * effective_from) version is its row in the LATEST batch that wrote
    * it ([[currentScd2History]]); untouched keys' rows are never
    * rewritten.
    */
  def continuousScd2(updates: DataFrame, keyCols: Seq[String], tsCol: String,
      tieCol: String, attrCols: Seq[String], statePath: String,
      checkpoint: String): DataStreamWriter[Row] =
    updates.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val cols = keyCols ++ Seq(tsCol, tieCol) ++ attrCols
        val cur = batch.toDF().select(cols.map(col): _*)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          cur.count()
          val currentOfTouched =
            try {
              val hist = spark.read.parquet(statePath)
                .where(col("batch_id") =!= batchId)
              // live row per version — identity is (key, effective_from,
              // tie): equal-ts observations may open two versions at one
              // effective_from, and the synthetic replay carries the
              // original tie so rewrites collide with their own version —
              // then the open version per touched key
              hist.groupBy((keyCols ++ Seq("effective_from", tieCol)).map(col): _*)
                .agg(max_by(struct(hist.columns.map(col): _*), col("batch_id"))
                  .as("__r"))
                .select(col("__r.*"))
                .where(col("is_current"))
                .join(cur.select(keyCols.map(col): _*).distinct(),
                  keyCols, "left_semi")
            } catch {
              case e: org.apache.spark.sql.AnalysisException
                  if e.getCondition == "PATH_NOT_FOUND" =>
                // first batch: empty frame with the history schema
                graft.operators.Scd2.history(cur.limit(0),
                  keyCols, tsCol, tieCol, attrCols)
            }
          // synthetic observation per touched key's open version: its
          // effective_from + attrs re-enter the change-compression walk
          val synth = currentOfTouched.select(
            (keyCols.map(col) :+ col("effective_from").as(tsCol) :+
              col(tieCol)) ++ attrCols.map(col): _*)
          val delta = graft.operators.Scd2.history(
            synth.union(cur), keyCols, tsCol, tieCol, attrCols)
          delta.withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(statePath)
          ()
        } finally cur.unpersist(blocking = false)
      }

  /** The live SCD2 history of a [[continuousScd2]] state table: the
    * latest batch's row per (key, effective_from) version. Read cost
    * scales with accumulated deltas; [[compactScd2History]] folds them
    * periodically if the stream runs for months.
    */
  def currentScd2History(spark: org.apache.spark.sql.SparkSession,
      statePath: String, keyCols: Seq[String], tieCol: String): DataFrame = {
    val hist = spark.read.parquet(statePath)
    hist.groupBy((keyCols ++ Seq("effective_from", tieCol)).map(col): _*)
      .agg(max_by(struct(hist.columns.filter(_ != "batch_id").map(col): _*),
        col("batch_id")).as("__r"))
      .select(col("__r.*"))
  }

  /** Compact a [[continuousScd2]] state table — the
    * [[compactClusterLabels]] discipline ported to version rows: fold
    * every COMMITTED delta partition (all but the latest batch, plus any
    * prior snapshot) into one live-row snapshot at `batch_id = -1`, then
    * prune the folded deltas. Real batch ids are ≥ 0, so `max_by`
    * always prefers a live delta over the snapshot; the latest delta is
    * never folded, so Structured Streaming's replay of the one batch it
    * ever replays stays safe; the snapshot lands BEFORE the prune, so a
    * crash between the two leaves duplicate rows that agree in value.
    */
  def compactScd2History(spark: org.apache.spark.sql.SparkSession,
      statePath: String, keyCols: Seq[String], tieCol: String): Unit = {
    val all =
      try spark.read.parquet(statePath)
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getCondition == "PATH_NOT_FOUND" => return
      }
    val maxB = all.agg(max(col("batch_id"))).head.get(0)
    if (maxB == null) return
    val maxBatch = maxB.toString.toLong
    if (maxBatch <= 0) return
    val folded = all.where(col("batch_id") < maxBatch)
    val snapshot = folded
      .groupBy((keyCols ++ Seq("effective_from", tieCol)).map(col): _*)
      .agg(max_by(struct(folded.columns.filter(_ != "batch_id").map(col): _*),
        col("batch_id")).as("__r"))
      .select(col("__r.*"))
      .withColumn("batch_id", lit(-1L))
    snapshot.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(statePath)
    val root = new org.apache.hadoop.fs.Path(statePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(root).foreach { st =>
      val name = st.getPath.getName
      if (st.isDirectory && name.startsWith("batch_id=")) {
        val bid = scala.util.Try(name.stripPrefix("batch_id=").toLong)
        if (bid.toOption.exists(b => b >= 0 && b < maxBatch))
          fs.delete(st.getPath, true)
      }
    }
  }

  /** Delete `batch_id=` partition directories not in `keep` — the shared
    * prune of the replace-per-batch state tables ([[continuousCapPerGroup]],
    * [[continuousFunnel]]). Runs AFTER the new state commits, so a crash
    * leaves extra (correct) partitions, never missing ones.
    */
  private def pruneBatchPartitions(spark: org.apache.spark.sql.SparkSession,
      path: String, keep: Set[Long]): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(root).foreach { st =>
      val name = st.getPath.getName
      if (st.isDirectory && name.startsWith("batch_id=")) {
        val bid = scala.util.Try(name.stripPrefix("batch_id=").toLong)
        if (bid.toOption.exists(b => !keep.contains(b)))
          fs.delete(st.getPath, true)
      }
    }
  }

  /** Continuous-ingestion SPAN dedup — the exact-substring face of the
    * probe-and-append loop, completing the family symmetry (MinHash,
    * SimHash, embedding, and now spans all stream the same way): each
    * micro-batch is rebuilt against the persisted first-occurrence block
    * index ([[graft.operators.TrainingData.dedupSpansIncremental]]) —
    * blocks already owned by the ingested corpus, or by an earlier doc
    * in the batch, are stripped — and the deduped text is written to
    * `outPath`; then the batch's NEW first-occurrence blocks
    * ([[graft.operators.TrainingData.spanIndexDelta]]) append to the
    * index so later batches match against them.
    *
    * Accumulated state is the fixed-width block-key index on disk
    * (one row per distinct block ever seen), never text; both writes
    * are per-batch-id dynamic-partition overwrites, so replays replace
    * rather than duplicate (the index read excludes the replaying
    * batch's own failed rows). The rebuilt output equals the batch
    * restriction of a full-corpus [[graft.operators.TrainingData.dedupSpans]]
    * whenever ingestion order matches id order — the same invariant the
    * other incremental dedups state.
    */
  def continuousSpanDedup(docs: DataFrame, idCol: String, textCol: String,
      indexPath: String, outPath: String, checkpoint: String,
      k: Int = 8): DataStreamWriter[Row] = {
    import graft.operators.TrainingData
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        // the batch feeds two tokenize passes (rebuild + index delta) —
        // persist the raw batch once, release deterministically
        val b = batch.toDF()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          b.count()
          val existing =
            try spark.read.parquet(indexPath)
              .where(col("batch_id") =!= batchId).drop("batch_id")
            catch {
              // ONLY path-not-found means "first batch" — see
              // continuousNearDup
              case e: org.apache.spark.sql.AnalysisException
                  if e.getCondition == "PATH_NOT_FOUND" =>
                TrainingData.spanIndex(b.limit(0), idCol, textCol, k)
            }
          def writeBatch(df: DataFrame, path: String): Unit = df
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(path)
          // output first, index second: a crash between the two replays
          // the batch with the index still excluding its own rows
          writeBatch(
            TrainingData.dedupSpansIncremental(b, idCol, textCol, k, existing),
            outPath)
          writeBatch(
            TrainingData.spanIndexDelta(b, idCol, textCol, k, existing),
            indexPath)
        } finally b.unpersist(blocking = false)
        ()
      }
  }

  /** Continuous-ingestion CDC chunk dedup — the content-defined-boundary
    * face of the same probe-and-append loop as [[continuousSpanDedup]]:
    * each micro-batch is deduped against the persisted first-occurrence
    * chunk index ([[graft.operators.TrainingData.cdcDedupIncremental]]) —
    * chunks already owned by the ingested corpus, or by an earlier doc
    * in the batch, are dropped — and the per-doc dedup summary
    * (n_chunks, n_chunks_kept, dedup_md5) is written to `outPath`; then
    * the batch's NEW first-occurrence chunks
    * ([[graft.operators.TrainingData.cdcIndexDelta]]) append to the
    * index so later batches match against them.
    *
    * Accumulated state is the fixed-width chunk-digest index on disk
    * (one row per distinct chunk ever seen), never text; both writes
    * are per-batch-id dynamic-partition overwrites, so replays replace
    * rather than duplicate (the index read excludes the replaying
    * batch's own failed rows). The output equals the batch restriction
    * of a full-corpus [[graft.operators.TrainingData.cdcDedup]]
    * whenever ingestion order matches id order — the invariant the
    * other incremental dedups state.
    */
  def continuousCdcDedup(docs: DataFrame, idCol: String, textCol: String,
      indexPath: String, outPath: String, checkpoint: String,
      w: Int = 8, maskBits: Int = 6): DataStreamWriter[Row] = {
    import graft.operators.TrainingData
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        // fail the batch loudly while compactCdcIndex holds the store —
        // reading half-rewritten partitions would silently mis-dedup;
        // the failed batch replays after the maintenance completes
        graft.operators.AtomicBatches.assertNotInMaintenance(spark,
          indexPath, "continuousCdcDedup")
        // the batch feeds two chunking passes (dedup + index delta) —
        // persist the raw batch once, release deterministically
        val b = batch.toDF()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          b.count()
          val existing =
            try {
              val raw = spark.read.parquet(indexPath)
                .where(col("batch_id") =!= batchId)
              // takedown-aware ([[cdcStateDelete]]): a deleted doc's
              // owned chunks are hidden (batch_id ≤ its up_to), so the
              // new batch neither dedups against them nor fails to
              // re-own them; a re-ingested victim's newer rows outrank
              // the deletion
              val live = cdcVictims(spark, indexPath) match {
                case None => raw
                case Some(v) =>
                  raw.join(v.select(col("id").as(idCol), col("up_to")),
                      Seq(idCol), "left_outer")
                    .filter(col("up_to").isNull ||
                      col("batch_id").cast("long") > col("up_to"))
                    .drop("up_to")
              }
              live.drop("batch_id")
            } catch {
              // ONLY path-not-found means "first batch" — see
              // continuousNearDup
              case e: org.apache.spark.sql.AnalysisException
                  if e.getCondition == "PATH_NOT_FOUND" =>
                TrainingData.cdcIndex(b.limit(0), idCol, textCol, w, maskBits)
            }
          def writeBatch(df: DataFrame, path: String): Unit = df
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(path)
          // output first, index second: a crash between the two replays
          // the batch with the index still excluding its own rows
          writeBatch(
            TrainingData.cdcDedupIncremental(b, idCol, textCol, w, maskBits,
              existing),
            outPath)
          writeBatch(
            TrainingData.cdcIndexDelta(b, idCol, textCol, w, maskBits,
              existing),
            indexPath)
        } finally b.unpersist(blocking = false)
        ()
      }
  }

  /** Deleted ids of a [[continuousCdcDedup]] index as (id, up_to) —
    * latest deletion per id — or None. The `_victims` channel lives
    * inside `indexPath` (underscore-hidden from the batch-partition
    * reads, collision-free with the stream's `batch_id=` overwrites).
    */
  private def cdcVictims(spark: org.apache.spark.sql.SparkSession,
      indexPath: String): Option[DataFrame] =
    graft.operators.Similarity
      .readParquetIfAny(spark, s"$indexPath/_victims")
      .map(_.groupBy("id").agg(max(col("up_to")).as("up_to")))

  /** DELETE (takedown) face of a [[continuousCdcDedup]] persisted chunk
    * index: one bounded (id, up_to) append to the `_victims` channel —
    * no index partition is rewritten at delete time. The stream's probe
    * hides the victims' owned rows (batch_id ≤ up_to), with the
    * [[graft.operators.TrainingData.cdcIndexDelete]] owner-forgetting
    * semantics (conservative: dedup under-fires on digests first-owned
    * by a victim; a rebuild re-elects). A later batch re-ingesting the
    * victim re-owns its chunks — its rows outrank the deletion.
    * Physical removal is [[compactCdcIndex]]'s job. The dedup OUTPUT
    * stream at `outPath` is downstream data, not index state — purge it
    * through the downstream store's own takedown.
    */
  def cdcStateDelete(victims: DataFrame, idCol: String,
      indexPath: String): Unit = {
    import graft.operators.AtomicBatches
    val spark = victims.sparkSession
    AtomicBatches.assertNotInMaintenance(spark, indexPath, "cdcStateDelete")
    val upTo = Option(spark.read.parquet(indexPath)
        .agg(max(col("batch_id").cast("long"))).head.get(0))
      .map(_.toString.toLong)
      .getOrElse(throw new IllegalArgumentException(
        s"no chunk index under $indexPath - nothing to delete from"))
    victims.select(col(idCol).cast("long").as("id")).distinct()
      .withColumn("up_to", lit(upTo))
      .write.mode("append").parquet(s"$indexPath/_victims")
  }

  /** Physically remove a CDC chunk index's deleted rows: rewrite only
    * the victim-touched COMMITTED batch partitions (the latest batch
    * stays untouched for the replay contract — victims deleted at the
    * stream head stay pending until the next batch or an
    * `includeLatest` quiesced pass), then GC victim records whose rows
    * are all physical (`up_to` below the horizon). EXCLUSIVE
    * maintenance via the `_MAINT` marker; crash leaves it; re-run with
    * `takeover = true`.
    */
  def compactCdcIndex(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, includeLatest: Boolean = false,
      takeover: Boolean = false): Unit = {
    import graft.operators.{AtomicBatches, Similarity}
    import org.apache.spark.sql.graft.Bridge
    if (Similarity.readParquetIfAny(spark, s"$indexPath/_victims").isEmpty &&
        !AtomicBatches.maintenanceActive(spark, indexPath)) return
    AtomicBatches.withMaintenanceLock(spark, indexPath, takeover) {
      Similarity.readParquetIfAny(spark, s"$indexPath/_victims").foreach {
        v0 =>
        val store = spark.read.parquet(indexPath)
        val idCol = store.columns.filterNot(c =>
          c == "chunk_md5" || c == "chunk_idx" || c == "batch_id").head
        // NO non-local return in here (it would skip the lock release);
        // a rowless store folds through as an empty prune
        val maxBatch = Option(store
            .agg(max(col("batch_id").cast("long"))).head.get(0))
          .map(_.toString.toLong).getOrElse(Long.MinValue)
        val horizon = if (includeLatest) Long.MaxValue else maxBatch
        val v = v0.groupBy("id").agg(max(col("up_to")).as("up_to"))
          .localCheckpoint(true)
        val fs = new org.apache.hadoop.fs.Path(indexPath)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        try {
          // shared rewrite protocol: touched-only dynamic overwrite +
          // emptied-partition deletion (AtomicBatches)
          val joined = store
            .join(v.select(col("id").as(idCol), col("up_to")),
              Seq(idCol), "left_outer")
          val dead = col("batch_id").cast("long") < lit(horizon) &&
            col("up_to").isNotNull &&
            col("batch_id").cast("long") <= col("up_to")
          AtomicBatches.pruneDeadPartitionRows(spark, indexPath,
            "batch_id", joined, dead, store.columns.toSeq)
          // GC victims whose every possible row is now physical; later
          // deletions (up_to ≥ horizon) stay pending and keep hiding
          val pending = v.filter(col("up_to") >= lit(horizon))
            .localCheckpoint(true)
          val vroot = new org.apache.hadoop.fs.Path(s"$indexPath/_victims")
          if (pending.isEmpty) fs.delete(vroot, true)
          else {
            pending.write.mode("overwrite").parquet(vroot.toString)
          }
          Bridge.releaseLocalCheckpoint(pending)
        } finally Bridge.releaseLocalCheckpoint(v)
      }
    }
  }

  /** Continuous-ingestion near-dup for the HAMMING family — the chunk-
    * blocked analog of [[continuousNearDup]]: each micro-batch builds its
    * (id, sig, bucket) chunk index rows via `indexOf` (text SimHash, image
    * perceptual hash, audio fingerprint — anything emitting
    * [[graft.operators.Dedup.chunkBuckets]] shape), probes the persisted
    * index of everything ingested before it
    * ([[graft.operators.Dedup.simhashIncrementalFromIndex]]), appends the
    * new-involving pairs, then appends its own index rows. Media/text
    * bytes are read exactly once, ever; accumulated state is the 8-byte-
    * signature index on disk. Same per-batch-id dynamic partition
    * overwrite as [[continuousNearDup]], so replays replace rather than
    * duplicate.
    */
  def continuousHammingDedup(docs: DataFrame, indexOf: DataFrame => DataFrame,
      idCol: String, indexPath: String, pairsPath: String, checkpoint: String,
      maxHamming: Int, maxBucketSize: Int = 1000): DataStreamWriter[Row] =
    continuousIndexedDedup(docs, indexOf,
      (newIdx, existing) => graft.operators.Dedup
        .simhashIncrementalFromIndex(newIdx, idCol, existing,
          maxHamming, maxBucketSize),
      idCol, indexPath, pairsPath, checkpoint)

  /** Continuous-ingestion embedding near-dup — the hyperplane-LSH face of
    * the same loop ([[graft.operators.Dedup.embeddingCosineIncremental]]):
    * per batch, vector → single LSH bucket → probe the persisted index +
    * self → append cosine pairs and index rows.
    */
  def continuousEmbeddingDedup(docs: DataFrame, idCol: String, vecCol: String,
      indexPath: String, pairsPath: String, checkpoint: String,
      dim: Int, nBits: Int = 8, threshold: Double = 0.95,
      kernel: String = "xxhash", maxBucketSize: Int = 1000): DataStreamWriter[Row] =
    continuousIndexedDedup(docs,
      b => graft.operators.Dedup.embeddingIndex(b, idCol, vecCol, dim, nBits, kernel),
      (newIdx, existing) => graft.operators.Dedup
        .embeddingCosineIncrementalFromIndex(newIdx, idCol, existing,
          threshold, maxBucketSize),
      idCol, indexPath, pairsPath, checkpoint)

  /** Continuous near-dup WITH cluster-label maintenance: the MinHash
    * probe-and-append loop of [[continuousNearDup]], plus per-batch
    * incremental connected components
    * ([[graft.operators.Dedup.incrementalComponentDelta]]) into an
    * append-only labels table at `labelsPath`.
    *
    * Labels are stored as DELTAS partitioned by batch id — each batch
    * writes only the labels its pairs changed (re-propagated affected
    * components + newly clustered ids), never the corpus-sized label
    * set. The current label of an id is its row in the latest batch
    * that touched it ([[currentClusterLabels]]); a batch replay
    * overwrites its own partition like the pair/index writes.
    *
    * `compactEveryBatches > 0` runs [[compactClusterLabels]] inline
    * after every Nth batch's label write, so a long-running stream's
    * delta history stays bounded without a separate maintenance job
    * (reads then touch the snapshot + ≤N deltas). Safe at any cadence:
    * compaction never folds the latest delta, so the streaming replay
    * contract is untouched, and it only ever rewrites partition -1.
    */
  def continuousClusteredDedup(docs: DataFrame, idCol: String, textCol: String,
      indexPath: String, pairsPath: String, labelsPath: String,
      checkpoint: String, numHashes: Int = 16, bands: Int = 8,
      shingleN: Int = 5, threshold: Double = 0.5,
      estimateSlack: Double = 0.25,
      compactEveryBatches: Int = 0): DataStreamWriter[Row] = {
    import graft.operators.Dedup
    continuousIndexedDedup(docs,
      b => Dedup.minhashIndex(b, idCol, textCol, numHashes, bands, shingleN),
      (newIdx, existing) => Dedup.minhashLshIncrementalFromIndex(newIdx, idCol,
        existing, numHashes, threshold, estimateSlack),
      idCol, indexPath, pairsPath, checkpoint, labelsPath = Some(labelsPath),
      compactEveryBatches = compactEveryBatches)
  }

  /** Current (id, cluster_id) view over a [[continuousClusteredDedup]]
    * labels table: latest batch's row per id, with committed takedown
    * corrections ([[clusterStateDelete]]) applied — a correction
    * replaces an id's label (or removes it, NULL) unless a LATER batch
    * re-touched the id (batch_id > the correction's `up_to`: the delta
    * wins, the legitimate resurrection path). Cost scales with the
    * ever-clustered id count (pairs are sparse relative to the corpus),
    * not the corpus.
    */
  def currentClusterLabels(spark: org.apache.spark.sql.SparkSession,
      labelsPath: String): DataFrame =
    currentClusterLabelsAt(spark, labelsPath, excludeBatch = None)

  /** [[currentClusterLabels]] with one delta partition excluded — the
    * stream loop's own read (a replayed batch must not fold its prior
    * attempt's rows into the state it rebuilds from).
    */
  private[graft] def currentClusterLabelsAt(
      spark: org.apache.spark.sql.SparkSession, labelsPath: String,
      excludeBatch: Option[Long]): DataFrame = {
    graft.operators.AtomicBatches.assertNotInMaintenance(spark, labelsPath,
      "cluster-label read")
    // a COMPLETE takedown legitimately leaves the store with zero delta
    // partitions (every labeled id corrected to NULL, the snapshot
    // deleted): "no labels" is an answer, not an error
    val rawOpt = graft.operators.Similarity
      .readParquetIfAny(spark, labelsPath)
    if (rawOpt.isEmpty)
      return spark.range(0).select(col("id").cast("long").as("id"),
        col("id").cast("long").as("cluster_id"))
    val raw = rawOpt.get
    val deltas = excludeBatch
      .map(b => raw.where(col("batch_id") =!= b)).getOrElse(raw)
    val latest = deltas.groupBy("id")
      .agg(max_by(col("cluster_id"), col("batch_id")).as("cluster_id"),
        max(col("batch_id").cast("long")).as("__b"))
    clusterCorrections(spark, labelsPath) match {
      case None => latest.drop("__b")
      case Some(corr) =>
        // latest correction per id (seq = staging order); it applies iff
        // nothing newer than its up_to re-touched the id
        val latestCorr = corr.groupBy("id")
          .agg(max_by(struct(col("cluster_id"), col("up_to")), col("seq"))
            .as("__c"))
          .select(col("id"), col("__c.cluster_id").as("__cc"),
            col("__c.up_to").as("__upto"))
        latest.join(latestCorr, Seq("id"), "left_outer")
          .select(col("id"),
            when(col("__upto").isNotNull && col("__b") <= col("__upto"),
              col("__cc")).otherwise(col("cluster_id")).as("cluster_id"))
          .filter(col("cluster_id").isNotNull)
    }
  }

  /** Committed takedown correction rows (id, cluster_id NULLABLE,
    * up_to, seq) of a labels store, or None. The `_corrections` channel
    * lives INSIDE `labelsPath` — the underscore prefix hides it from
    * the plain parquet read of the delta partitions, and a resumed
    * stream's `batch_id=` dynamic overwrites can never collide with it
    * (the lesson the ANN tombstones channel was built on).
    */
  private def clusterCorrections(spark: org.apache.spark.sql.SparkSession,
      labelsPath: String): Option[DataFrame] = {
    val dirs = graft.operators.AtomicBatches
      .committedDirs(spark, s"$labelsPath/_corrections")
    if (dirs.isEmpty) None
    else Some(spark.read.parquet(dirs.map(d => s"$d/labels"): _*))
  }

  /** Deleted ids of a labels store as (id, up_to) — latest deletion per
    * id — or None. Read by every face that must HIDE a victim's rows:
    * the stream loop's index probe and [[currentClusterPairs]].
    */
  private[graft] def clusterVictims(spark: org.apache.spark.sql.SparkSession,
      labelsPath: String): Option[DataFrame] = {
    val dirs = graft.operators.AtomicBatches
      .committedDirs(spark, s"$labelsPath/_corrections")
    if (dirs.isEmpty) None
    else Some(spark.read.parquet(dirs.map(d => s"$d/victims"): _*)
      .groupBy("id").agg(max(col("up_to")).as("up_to")))
  }

  /** Current pair relation of a [[continuousClusteredDedup]] state:
    * the accumulated pair store minus every pair touching a deleted doc
    * (a pair row dies iff either endpoint is a victim whose deletion
    * covers the pair's batch — batch_id ≤ up_to; a post-delete batch's
    * pairs survive, the resurrection path). This is the system of
    * record [[clusterStateDelete]] re-closes over.
    */
  def currentClusterPairs(spark: org.apache.spark.sql.SparkSession,
      pairsPath: String, labelsPath: String): DataFrame = {
    // compactClusterState rewrites victim-touched pair partitions in
    // place under the labels store's _MAINT — a read racing it would
    // silently miss or double rows (every other read/write face of the
    // cluster state carries this guard; this one was the gap)
    graft.operators.AtomicBatches.assertNotInMaintenance(spark, labelsPath,
      "currentClusterPairs")
    val pairs = spark.read.parquet(pairsPath)
    clusterVictims(spark, labelsPath) match {
      case None => pairs
      case Some(v) =>
        pairs.withColumn("__pb", col("batch_id").cast("long"))
          .join(v.select(col("id").as("id_a"), col("up_to").as("__ua")),
            Seq("id_a"), "left_outer")
          .join(v.select(col("id").as("id_b"), col("up_to").as("__ub")),
            Seq("id_b"), "left_outer")
          .filter((col("__ua").isNull || col("__pb") > col("__ua")) &&
            (col("__ub").isNull || col("__pb") > col("__ub")))
          .select(pairs.columns.map(col): _*)
    }
  }

  /** DELETE (takedown) face of a [[continuousClusteredDedup]] state —
    * the tombstone discipline applied to the THREE stores the stream
    * maintains, in one bounded, atomic staging write (nothing
    * corpus-partitioned is rewritten at delete time):
    *
    *  - the VICTIMS' records (id, up_to = max stream batch at delete
    *    time) hide their index rows from future probes (no new pairs
    *    against deleted docs) and their pair rows from future
    *    re-closures ([[currentClusterPairs]]);
    *  - the LABEL OVERRIDES re-close every component a victim belonged
    *    to over the surviving pairs ([[graft.operators.Dedup
    *    .deleteFromLabels]] semantics: representatives re-elect,
    *    bridge-removal splits are honored, orphaned members drop —
    *    cluster_id NULL removes a row), computed eagerly here because
    *    they need the pair store, and bounded by the affected
    *    components' subgraph;
    *
    * both staged under `labelsPath/_corrections/<n>/` and made visible
    * atomically by the `_COMMIT` marker — a crash mid-staging leaves an
    * invisible directory the next delete sweeps; a half takedown
    * (victims hidden but clusters not re-closed, or vice versa) cannot
    * be observed. A LATER stream batch that re-ingests a victim
    * resurrects it (its delta rows outrank the correction's `up_to`).
    * Physical removal is [[compactClusterState]]'s job.
    *
    * Run with the stream quiesced for strict semantics: a batch
    * processing CONCURRENTLY with the delete may fold pairs it derived
    * from pre-takedown state (its delta outranks the correction — the
    * replay-safe ordering), leaving the victim's id visible as a label
    * row until the next touch or compaction.
    */
  def clusterStateDelete(victims: DataFrame, idCol: String,
      indexPath: String, pairsPath: String, labelsPath: String,
      maxIter: Int = 20): Unit = {
    import graft.operators.{AtomicBatches, Dedup}
    import org.apache.spark.sql.graft.Bridge
    val spark = victims.sparkSession
    AtomicBatches.assertNotInMaintenance(spark, labelsPath,
      "clusterStateDelete")
    val croot = s"$labelsPath/_corrections"
    AtomicBatches.sweepUncommitted(spark, croot)
    // up_to: the takedown kills state up to and including the latest
    // batch at delete time; later batches legitimately resurrect. Read
    // from the INDEX store, not the labels store: a pair-less batch
    // writes an EMPTY label delta (dynamic overwrite of zero rows is a
    // no-op, no partition lands) but its docs' index rows DO land — a
    // labels-derived up_to would under-read and leave such a doc's
    // index rows visible, an un-hidden victim. Fails loudly when
    // there is no state at all.
    val upTo = Seq(indexPath, labelsPath)
      .flatMap(p => graft.operators.Similarity.readParquetIfAny(spark, p))
      .flatMap(df =>
        Option(df.agg(max(col("batch_id").cast("long"))).head.get(0)))
      .map(_.toString.toLong)
      .reduceOption((a: Long, b: Long) => math.max(a, b))
      .getOrElse(throw new IllegalArgumentException(
        s"no index/label state under $indexPath / $labelsPath - " +
          "nothing to delete from"))
    val v = victims.select(col(idCol).cast("long").as("id")).distinct()
      .localCheckpoint(true) // read by affected, subPairs ×2, staging
    try {
      if (v.isEmpty) return
      // a stream of all-unique docs writes EMPTY label/pair deltas — no
      // partition, possibly no directory — yet its victims still need
      // their records staged (that is what hides their INDEX rows):
      // treat an unreadable labels/pairs store as empty, never abort
      def emptyLongs(names: String*): DataFrame =
        names.map(n => spark.range(0).select(col("id").cast("long").as(n)))
          .reduce((a, b) => a.crossJoin(b))
      val lab = graft.operators.Similarity
        .readParquetIfAny(spark, labelsPath)
        .map(_ => currentClusterLabels(spark, labelsPath))
        .getOrElse(emptyLongs("id", "cluster_id"))
        .localCheckpoint(true) // read for affected + members
      try {
        val p = graft.operators.Similarity
          .readParquetIfAny(spark, pairsPath)
          .map(_ => currentClusterPairs(spark, pairsPath, labelsPath))
          .getOrElse(emptyLongs("id_a", "id_b"))
          .select(col("id_a").cast("long").as("a"),
            col("id_b").cast("long").as("b"))
        // the shared victims→affected→re-closure core
        // (Dedup.affectedReclosure — one implementation with the batch
        // label-store takedown, so a closure fix cannot miss a face)
        val (_, members, reclosed, release) =
          Dedup.affectedReclosure(lab, v, p, maxIter)
        try {
          val n = AtomicBatches.nextBatchN(spark, croot)
          val bdir = s"$croot/$n"
          // both staged tables are invisible until the _COMMIT below and
          // read only checkpointed frames — concurrent (the
          // CountStore.stageDelta judgment): the tiny victims write
          // overlaps the label-override join.
          // One override row per affected-component member: the
          // re-closed label, or NULL for victims and orphans (ids a
          // rebuild over survivors would never label)
          graft.operators.Takedown.inParallel(Seq[() => Unit](
            () => members
              .join(reclosed.select(col("id"), col("cluster_id").as("__nc")),
                Seq("id"), "left_outer")
              .select(col("id"), col("__nc").as("cluster_id"),
                lit(upTo).as("up_to"), lit(n).as("seq"))
              .write.mode("overwrite").parquet(s"$bdir/labels"),
            () => v.select(col("id"), lit(upTo).as("up_to"))
              .write.mode("overwrite").parquet(s"$bdir/victims")))(_.apply())
          AtomicBatches.commit(spark, bdir)
        } finally release()
      } finally Bridge.releaseLocalCheckpoint(lab)
    } finally Bridge.releaseLocalCheckpoint(v)
  }

  /** AUDIT face of a [[continuousClusteredDedup]] state: the ids that
    * still influence ANY of its read faces — a current label row, a
    * current pair endpoint, or a visible index row (the stream probes a
    * victim-pruned index: an index row is visible iff no victim record
    * covers its batch). One `id` column, missing stores fold as empty
    * ([[graft.operators.Takedown.audit]]'s cluster_state row).
    */
  def clusterStatePresentIds(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, pairsPath: String, labelsPath: String)
      : DataFrame = {
    import graft.operators.Similarity.readParquetIfAny
    graft.operators.AtomicBatches.assertNotInMaintenance(spark, labelsPath,
      "clusterStatePresentIds")
    val labelIds = readParquetIfAny(spark, labelsPath)
      .map(_ => currentClusterLabels(spark, labelsPath).select(col("id")))
    val pairIds = readParquetIfAny(spark, pairsPath)
      .map(_ => currentClusterPairs(spark, pairsPath, labelsPath)
        .select(explode(array(col("id_a"), col("id_b"))).as("id")))
    val indexIds = readParquetIfAny(spark, indexPath).map { idx =>
      val idCol = idx.columns.find(_ == "doc_id").getOrElse(
        idx.columns.filterNot(Set("batch_id", "sh", "sig", "bucket"))
          .head)
      val rows = idx.select(col(idCol).cast("long").as("id"),
        col("batch_id").cast("long").as("__b"))
      clusterVictims(spark, labelsPath) match {
        case None => rows.select("id")
        case Some(v) => rows
          .join(v.select(col("id"), col("up_to").as("__u")),
            Seq("id"), "left_outer")
          .filter(col("__u").isNull || col("__b") > col("__u"))
          .select("id")
      }
    }
    (labelIds.toSeq ++ pairIds.toSeq ++ indexIds.toSeq)
      .reduceOption(_ unionByName _)
      .map(_.distinct())
      .getOrElse(spark.range(0).select(col("id")))
  }

  /** AUDIT face of a [[continuousCdcDedup]] chunk index: the owner ids
    * whose chunk rows a probe can still see (victim records hide rows
    * at or below their `up_to`; a later re-ingest resurrects). One `id`
    * column ([[graft.operators.Takedown.audit]]'s cdc_state row).
    */
  def cdcStatePresentIds(spark: org.apache.spark.sql.SparkSession,
      indexPath: String): DataFrame = {
    graft.operators.AtomicBatches.assertNotInMaintenance(spark, indexPath,
      "cdcStatePresentIds")
    val store = spark.read.parquet(indexPath)
    val idCol = store.columns.filterNot(c =>
      c == "chunk_md5" || c == "chunk_idx" || c == "batch_id").head
    val rows = store.select(col(idCol).cast("long").as("id"),
      col("batch_id").cast("long").as("__b"))
    cdcVictims(spark, indexPath) match {
      case None => rows.select("id").distinct()
      case Some(v) => rows
        .join(v.select(col("id"), col("up_to").as("__u")),
          Seq("id"), "left_outer")
        .filter(col("__u").isNull || col("__b") > col("__u"))
        .select("id").distinct()
    }
  }

  /** Compact a [[continuousClusteredDedup]] labels table: fold every
    * COMMITTED delta partition (all but the latest batch, plus any prior
    * snapshot) into one snapshot partition at `batch_id = -1`, then prune
    * the folded delta directories. Without this, a long-running stream's
    * [[currentClusterLabels]] re-aggregates the whole delta history on
    * every read; after compaction a read touches only the snapshot + the
    * post-snapshot deltas. Run it periodically (e.g. every N batches,
    * from the maintenance side — it only rewrites partition -1).
    *
    * Safety: the view semantics are unchanged — real batch ids are ≥ 0,
    * so `max_by(batch_id)` always prefers a live delta over the snapshot.
    * The LATEST delta partition is never folded, so Structured
    * Streaming's replay of the last uncommitted batch (the only batch it
    * ever replays) cannot resurrect stale labels over the snapshot. The
    * snapshot is written BEFORE the deltas are pruned, so a crash between
    * the two leaves duplicate rows that agree in value (the snapshot
    * folded exactly those deltas); re-running compaction completes the
    * prune.
    */
  def compactClusterLabels(spark: org.apache.spark.sql.SparkSession,
      labelsPath: String): Unit = {
    // a labels store under compactClusterState maintenance may be
    // mid-rewrite — rewriting the −1 snapshot from it would bake the
    // inconsistent state in before a takeover re-run can repair it
    graft.operators.AtomicBatches.assertNotInMaintenance(spark, labelsPath,
      "compactClusterLabels")
    val all =
      try spark.read.parquet(labelsPath)
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getCondition == "PATH_NOT_FOUND" => return
      }
    val maxB = all.agg(max(col("batch_id"))).head.get(0)
    if (maxB == null) return
    val maxBatch = maxB.toString.toLong
    if (maxBatch <= 0) return // nothing strictly below the latest batch
    // pending takedown corrections PIN the fold horizon: a delta row
    // NEWER than a correction's up_to outranks it (the resurrection
    // rule), and folding that row to batch −1 would flip the verdict
    // (−1 ≤ up_to) — the correction would wrongly override it at read
    // time. Rows at or below EVERY correction's up_to fold safely
    // (already overridden before, still overridden at −1). Physical
    // application + GC of the corrections is compactClusterState's job.
    val minUpTo = clusterCorrections(spark, labelsPath)
      .flatMap(c => Option(c.agg(min(col("up_to"))).head.get(0)))
      .map(_.toString.toLong)
    val horizon = math.min(maxBatch, minUpTo.map(_ + 1).getOrElse(Long.MaxValue))
    if (horizon <= 0) return
    val snapshot = all.where(col("batch_id") < horizon)
      .groupBy("id")
      .agg(max_by(col("cluster_id"), col("batch_id")).as("cluster_id"))
      .withColumn("batch_id", lit(-1L))
    snapshot.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(labelsPath)
    // prune the folded delta partitions (0 ≤ batch_id < horizon) via the
    // filesystem — partition directories, the same granularity the
    // dynamic-overwrite writes use
    val root = new org.apache.hadoop.fs.Path(labelsPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(root).foreach { st =>
      val name = st.getPath.getName
      if (st.isDirectory && name.startsWith("batch_id=")) {
        val bid = scala.util.Try(name.stripPrefix("batch_id=").toLong)
        if (bid.toOption.exists(b => b >= 0 && b < horizon))
          fs.delete(st.getPath, true)
      }
    }
  }

  /** FULL maintenance pass of a [[continuousClusteredDedup]] state —
    * the physical-removal half of [[clusterStateDelete]], the
    * [[compactIvfDeltas]] discipline across all three stores:
    *
    *  1. label deltas below the fold horizon collapse into the
    *     `batch_id = -1` snapshot WITH the applied corrections folded
    *     in (an id's override wins unless a newer unfolded delta
    *     outranks it; NULL overrides drop the row);
    *  2. victim rows are physically removed from the committed PAIR
    *     and INDEX partitions (only victim-touched partitions are
    *     rewritten — dynamic partition overwrite, emptied directories
    *     deleted);
    *  3. correction batches whose `up_to` lies below the horizon are
    *     garbage-collected — everything they guard is now physical
    *     (mandatory in the same pass: folded rows collapse to batch
    *     −1, where a stale applied correction would wrongly re-fire);
    *     corrections at or above the horizon stay pending and remain
    *     consistent (every folded row ranks below their up_to too).
    *
    * `includeLatest = true` folds the newest delta as well — for a
    * fully-quiesced state (no stream running); the default preserves
    * the latest batch for the streaming replay contract, so a delete
    * staged after the last batch (up_to = that batch) stays PENDING
    * until more batches arrive or a quiesced `includeLatest` pass runs.
    *
    * EXCLUSIVE MAINTENANCE, enforced via the `_MAINT` marker at
    * `labelsPath` (the `AtomicBatches.withMaintenanceLock` contract):
    * label reads, deletes, and the stream loop fail loudly while it is
    * held; a crash leaves it; re-run with `takeover = true` (every
    * step is a pure function of the current tables — re-runnable).
    */
  def compactClusterState(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, pairsPath: String, labelsPath: String,
      includeLatest: Boolean = false, takeover: Boolean = false): Unit = {
    import graft.operators.AtomicBatches
    val hasCorr =
      AtomicBatches.committedDirs(spark, s"$labelsPath/_corrections").nonEmpty
    if (!hasCorr && !AtomicBatches.maintenanceActive(spark, labelsPath)) {
      // no takedown state: plain label folding is the whole job
      compactClusterLabels(spark, labelsPath)
      return
    }
    AtomicBatches.withMaintenanceLock(spark, labelsPath, takeover) {
      compactClusterStateBody(spark, indexPath, pairsPath, labelsPath,
        includeLatest)
    }
  }

  private def compactClusterStateBody(
      spark: org.apache.spark.sql.SparkSession, indexPath: String,
      pairsPath: String, labelsPath: String, includeLatest: Boolean): Unit = {
    import graft.operators.{AtomicBatches, Similarity}
    val fs = new org.apache.hadoop.fs.Path(labelsPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val allOpt = Similarity.readParquetIfAny(spark, labelsPath)
    // the stream's true position is the max batch across the stores —
    // the labels store alone under-reads it when recent batches were
    // pair-less (their empty label deltas write no partition), and an
    // ALL-unique stream has no readable labels partitions at all while
    // its INDEX still holds the victims' rows: an early return on the
    // unreadable labels store used to skip the physical prune and the
    // corrections GC entirely — a silent, permanent non-removal of
    // takedown data (r14 self-review)
    val maxBatch = (allOpt.toSeq ++
        Similarity.readParquetIfAny(spark, indexPath).toSeq)
      .flatMap(df =>
        Option(df.agg(max(col("batch_id").cast("long"))).head.get(0)))
      .map(_.toString.toLong)
      .reduceOption((a: Long, b: Long) => math.max(a, b))
      // NO readable store at all: with includeLatest there is no latest
      // batch to guard (horizon = ∞, pending corrections resolve over
      // empty stores); without it the horizon is unknowable and nothing
      // physical exists to prune — corrections stay pending
      .getOrElse { if (includeLatest) -1L else return }
    val horizon = if (includeLatest) Long.MaxValue else maxBatch
    val dirs = AtomicBatches.committedDirs(spark, s"$labelsPath/_corrections")
    // per-batch up_to is a staging-time constant — one driver row each
    val dirUpTo = dirs.map { d =>
      d -> spark.read.parquet(s"$d/victims")
        .agg(max(col("up_to"))).head.getLong(0)
    }
    val appliedDirs = dirUpTo.filter(_._2 < horizon).map(_._1)
    // 1) fold labels below the horizon, applying the APPLIED corrections
    // — only when the labels store has readable partitions (an
    // all-unique stream never writes one; the victim prune and GC below
    // still run)
    allOpt.foreach { all =>
      val folded = all.where(col("batch_id") < lit(horizon))
        .groupBy("id")
        .agg(max_by(col("cluster_id"), col("batch_id")).as("cluster_id"),
          max(col("batch_id").cast("long")).as("__b"))
      val snapped = if (appliedDirs.isEmpty) folded.drop("__b")
      else {
        val corr = spark.read.parquet(appliedDirs.map(d => s"$d/labels"): _*)
          .groupBy("id")
          .agg(max_by(struct(col("cluster_id"), col("up_to")), col("seq"))
            .as("__c"))
          .select(col("id"), col("__c.cluster_id").as("__cc"),
            col("__c.up_to").as("__upto"))
        folded.join(corr, Seq("id"), "left_outer")
          .select(col("id"),
            when(col("__upto").isNotNull && col("__b") <= col("__upto"),
              col("__cc")).otherwise(col("cluster_id")).as("cluster_id"))
          .filter(col("cluster_id").isNotNull)
      }
      if (maxBatch > 0 || includeLatest) {
        // the fold can be EMPTY (every folded id overridden to NULL by an
        // applied correction): dynamic overwrite of zero rows replaces
        // nothing, so a stale pre-takedown −1 snapshot would survive the
        // corrections' GC and silently resurrect the victims — delete the
        // snapshot partition explicitly in that case
        val snappedCp = snapped.localCheckpoint(true) // isEmpty + write
        try {
          if (snappedCp.isEmpty)
            fs.delete(
              new org.apache.hadoop.fs.Path(s"$labelsPath/batch_id=-1"), true)
          else snappedCp.withColumn("batch_id", lit(-1L))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(labelsPath)
        } finally org.apache.spark.sql.graft.Bridge
          .releaseLocalCheckpoint(snappedCp)
        val lroot = new org.apache.hadoop.fs.Path(labelsPath)
        fs.listStatus(lroot).foreach { st =>
          val name = st.getPath.getName
          if (st.isDirectory && name.startsWith("batch_id=")) {
            val bid = scala.util.Try(name.stripPrefix("batch_id=").toLong)
            if (bid.toOption.exists(b => b >= 0 && b < horizon))
              fs.delete(st.getPath, true)
          }
        }
      }
    }
    // 2) physically remove victim rows from the committed pair and
    // index partitions — victims from ALL correction batches (pending
    // ones keep their read-time rule for whatever this pass leaves)
    if (dirs.nonEmpty) {
      val victims = spark.read
        .parquet(dirs.map(d => s"$d/victims"): _*)
        .groupBy("id").agg(max(col("up_to")).as("up_to"))
        .localCheckpoint(true)
      try {
        // a row dies iff ANY of its id columns is a victim whose
        // deletion covers the row's batch — shared rewrite protocol
        // (AtomicBatches.pruneDeadPartitionRows handles touched-only
        // dynamic overwrite + emptied-partition deletion, with the
        // FileSystem resolved per store path)
        def pruneStore(path: String, store: DataFrame,
            idCols: Seq[String]): Unit = {
          var cond: Column = lit(false)
          var df = store
          idCols.zipWithIndex.foreach { case (ic, i) =>
            df = df.join(
              victims.select(col("id").as(ic), col("up_to").as(s"__u$i")),
              Seq(ic), "left_outer")
            cond = cond ||
              (col(s"__u$i").isNotNull &&
                col("batch_id").cast("long") <= col(s"__u$i"))
          }
          val dead = col("batch_id").cast("long") < lit(horizon) && cond
          graft.operators.AtomicBatches.pruneDeadPartitionRows(spark, path,
            "batch_id", df, dead, store.columns.toSeq)
        }
        Similarity.readParquetIfAny(spark, pairsPath).foreach(store =>
          pruneStore(pairsPath, store, Seq("id_a", "id_b")))
        // the index store's id column is its FIRST column (the
        // minhash/simhash/embedding index faces all put idCol first)
        Similarity.readParquetIfAny(spark, indexPath).foreach(store =>
          pruneStore(indexPath, store, Seq(store.columns.head)))
      } finally org.apache.spark.sql.graft.Bridge
        .releaseLocalCheckpoint(victims)
    }
    // 3) GC the applied correction batches — their kills and overrides
    // are physical now; pending ones keep guarding. Deleted in ASCENDING
    // numeric order (committedDirs lists lexicographically, where "10"
    // sorts before "2"): a crash mid-GC must only ever leave the NEWEST
    // corrections behind, whose re-application over the baked snapshot
    // is exactly the newest-wins rule — the other order could leave an
    // OLDER correction to re-apply on the takeover re-run, rolling a
    // later takedown's re-closure back (r14 self-review)
    appliedDirs.sortBy(_.split('/').last.toLong).foreach(d =>
      fs.delete(new org.apache.hadoop.fs.Path(d), true))
  }

  /** The shared probe-and-append micro-batch loop behind the continuous
    * dedup variants: build the new batch's index rows, probe them against
    * the persisted index of all prior batches, append pairs and index —
    * both writes per-batch-id dynamic-partition-overwritten so replays
    * replace rather than duplicate. With `labelsPath` set, each batch
    * also folds its pairs into the persisted cluster labels (see
    * [[continuousClusteredDedup]]).
    */
  private def continuousIndexedDedup(docs: DataFrame,
      indexOf: DataFrame => DataFrame,
      probe: (DataFrame, DataFrame) => DataFrame,
      idCol: String,
      indexPath: String, pairsPath: String,
      checkpoint: String, labelsPath: Option[String] = None,
      compactEveryBatches: Int = 0): DataStreamWriter[Row] = {
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        // fail EARLY while compactClusterState holds the labels store —
        // without this the batch would write pairs/index before the
        // label fold's own assert fired (replay-safe either way, but a
        // clean refusal beats a half-written batch)
        labelsPath.foreach(lp => graft.operators.AtomicBatches
          .assertNotInMaintenance(spark, lp, "continuousIndexedDedup"))
        // persist + unpersist, not localCheckpoint — see continuousNearDup
        val newIdx = indexOf(batch.toDF())
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          newIdx.count()
          val existing =
            try {
              val raw = spark.read.parquet(indexPath)
                .where(col("batch_id") =!= batchId)
              // takedown-aware probe: a deleted doc's index rows are
              // hidden (batch_id ≤ its up_to), so no new pairs ever
              // form against it; rows a later batch re-ingested outrank
              // the deletion and stay probeable (resurrection)
              val live = labelsPath.flatMap(clusterVictims(spark, _)) match {
                case None => raw
                case Some(v) =>
                  raw.join(v.select(col("id").as(idCol), col("up_to")),
                      Seq(idCol), "left_outer")
                    .filter(col("up_to").isNull ||
                      col("batch_id").cast("long") > col("up_to"))
                    .drop("up_to")
              }
              live.drop("batch_id")
            } catch {
              // ONLY path-not-found means "first batch" (see
              // continuousNearDup — other analysis errors must surface)
              case e: org.apache.spark.sql.AnalysisException
                  if e.getCondition == "PATH_NOT_FOUND" => newIdx.limit(0)
            }
          // the pair relation feeds the pair write AND (optionally) the
          // label maintenance — materialize once, bounded (new-involving
          // pairs only)
          val pairs = probe(newIdx, existing)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            def writeBatch(df: DataFrame, path: String): Unit = df
              .withColumn("batch_id", lit(batchId))
              .write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("batch_id")
              .parquet(path)
            writeBatch(pairs, pairsPath)
            writeBatch(newIdx, indexPath)
            labelsPath.foreach { lp =>
              // corrections-aware ([[currentClusterLabelsAt]]): a batch
              // folding pairs after a takedown must build on the
              // RE-CLOSED state, or it would propagate a deleted doc's
              // id as a cluster representative
              val current =
                try currentClusterLabelsAt(spark, lp, Some(batchId))
                catch {
                  case e: org.apache.spark.sql.AnalysisException
                      if e.getCondition == "PATH_NOT_FOUND" =>
                    pairs.select(col("id_a").as("id"),
                      col("id_a").as("cluster_id")).limit(0)
                }
              // WithCleanup: the delta's cached frames are released in the
              // finally — per-batch localCheckpoint/persist blocks must
              // not wait on GC-driven ContextCleaner reclamation or they
              // accumulate for the stream's lifetime
              val (delta, release) = graft.operators.Dedup
                .incrementalComponentDeltaWithCleanup(current, pairs)
              try writeBatch(delta, lp)
              finally release()
              // inline maintenance: fold committed deltas into the -1
              // snapshot every N batches (batch 0 has nothing to fold)
              if (compactEveryBatches > 0 && batchId > 0 &&
                  batchId % compactEveryBatches == 0)
                compactClusterLabels(spark, lp)
            }
          } finally pairs.unpersist(blocking = false)
        } finally newIdx.unpersist(blocking = false)
        ()
      }
  }

  /** [[continuousHammingDedup]] specialized to text SimHash — the
    * streaming face of [[graft.operators.Dedup.simhashIncremental]].
    */
  def continuousSimhashDedup(docs: DataFrame, idCol: String, textCol: String,
      indexPath: String, pairsPath: String, checkpoint: String,
      maxHamming: Int = 3, maxBucketSize: Int = 1000,
      kernel: String = "xxhash"): DataStreamWriter[Row] =
    continuousHammingDedup(docs,
      b => graft.operators.Dedup.simhashIndex(b, idCol, textCol, maxHamming, kernel),
      idCol, indexPath, pairsPath, checkpoint, maxHamming, maxBucketSize)

  /** Continuous maintenance of a persisted IVF ANN index
    * ([[graft.operators.Similarity.ivfWriteIndex]] layout): each
    * micro-batch of new vectors is assigned to its nearest FROZEN
    * centroid ([[graft.operators.Similarity.ivfAppend]]'s rule, shared
    * code — batch and stream apply the identical quantizer) and lands as
    * a per-batch-id DELTA partition under `<indexPath>/deltas` with
    * dynamic partition overwrite, so an at-least-once replay replaces its
    * own partition instead of duplicating vectors (`ivfAppend`'s
    * `mode("append")` is NOT replay-safe — that is exactly why the
    * streaming face writes deltas, the [[continuousNearDup]] discipline).
    *
    * Probe with [[ivfTopKFromStreamIndex]] (base cells ∪ deltas, both
    * cell-pruned). `compactEveryBatches > 0` folds committed deltas into
    * the cell-partitioned base every Nth batch ([[compactIvfDeltas]]), so
    * a long-running stream's probe cost stays one base read + ≤N small
    * deltas. Retraining the coarse quantizer itself (centroid drift) is a
    * REBUILD — `ivfWriteIndex` over the union to a fresh path and a
    * stream restart, the same train-offline / score-online split as
    * [[continuousKmeansAssign]]: frozen assignment is what makes batch
    * and stream indexes interchangeable.
    */
  def continuousIvfAppend(vecs: DataFrame, idCol: String, vecCol: String,
      indexPath: String, checkpoint: String,
      compactEveryBatches: Int = 0): DataStreamWriter[Row] = {
    import graft.operators.Similarity
    vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        // the frozen quantizer: ≤2^nBits rows, read per batch so an
        // offline rebuild that swaps the centroids table is picked up at
        // the next batch boundary
        val cents = Similarity.readCentroids(spark, indexPath)
        Similarity.assignToCells(batch.toDF(), idCol, vecCol, cents)
          .withColumn("batch_id", lit(batchId))
          // cluster by cell: each task writes one cell-coherent file, so
          // the delta read's cell predicate prunes via row-group stats
          // even though the delta tree partitions on batch_id
          .repartition(col("cell"))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(s"$indexPath/deltas")
        if (compactEveryBatches > 0 && batchId > 0 &&
            batchId % compactEveryBatches == 0)
          compactIvfDeltas(spark, indexPath)
        ()
      }
  }

  /** Fold a [[continuousIvfAppend]] (or [[continuousPqAppend]] — the
    * fold is layout-generic over the columns between id and `cell`)
    * stream's COMMITTED delta partitions (all but the latest batch)
    * into the cell-partitioned base at `<indexPath>/cells`, then prune
    * the folded delta directories — the [[compactClusterLabels]]
    * discipline on vector rows.
    *
    * Cost is bounded by delta locality, not corpus size: only the cell
    * partitions the deltas TOUCH are rewritten (read cell-pruned via an
    * `isin` literal over the delta's distinct cells — ≤2^nBits longs on
    * the driver — then dynamic-partition-overwritten), plus one
    * column-pruned (id, cell) pass over the base to find the PRIOR cell
    * of any re-ingested id (so an id whose vector changed — and with it
    * its nearest centroid — has its stale row rewritten away, not left
    * behind in an untouched cell). Duplicate ids resolve by RECENCY, not
    * arbitrarily: the highest delta batch_id wins, and any delta beats
    * the base — deterministic for updates, and a no-op for crash-window
    * replays whose duplicates agree in value. Crash safety: a crash
    * between the base write and the delta prune leaves winner rows in
    * both; the re-run's anti-join removes the base copies and completes
    * the prune; the latest delta is never folded, so the streaming
    * replay contract (a replayed batch overwrites its own partition) is
    * untouched.
    *
    * TOMBSTONE-AWARE ([[graft.operators.Similarity.ivfDelete]]): the
    * delete face writes `(id, up_to)` rows into the dedicated
    * `tombstones/` channel (up_to = max batch id at delete time; a
    * version dies iff its batch_id ≤ up_to, the base ranking −1).
    * Compaction resolves every tombstone whose up_to lies below the
    * fold horizon — anti-joining the victim's base row away and
    * dropping its killed delta versions from the fold — and GCs those
    * applied tombstones in the same pass (mandatory: folded survivors
    * collapse to rank −1, where a stale tombstone would wrongly kill
    * them). Deleted rows' bytes are gone from `cells` after compaction;
    * a cell emptied by deletes has its directory removed like any
    * emptied prior cell. When the index has no deltas channel (batch
    * maintained, never streamed) there is no latest batch to guard and
    * ALL tombstones resolve regardless of `includeLatest`.
    *
    * `includeLatest = true` folds EVERY delta batch including the
    * newest — for batch-maintained indexes (delete-then-compact with no
    * stream running). It trades away the replay-safety margin above, so
    * only call it with the writer quiesced; a stream's own periodic
    * compaction must keep the default.
    *
    * EXCLUSIVE MAINTENANCE: like [[graft.operators.TrainingData
    * .bm25IndexCompact]], this is a maintenance operation — do not run
    * it concurrently with [[graft.operators.Similarity.ivfDelete]] (or a
    * second compaction) on the same index. The tombstone GC is a
    * read-then-overwrite of `tombstones/`; a delete racing into the
    * window between the read and the rewrite would be silently erased —
    * a lost takedown. Probes may run concurrently only under the default
    * `includeLatest = false` with a live deltas channel; the `_MAINT`
    * marker (`AtomicBatches.withMaintenanceLock`) enforces the writer
    * side of this contract: the marker is held for the whole rewrite,
    * every probe/delete/batch-append face fails loudly while it is
    * present, a crash leaves it in place (the index may be mid-rewrite)
    * and the re-run must pass `takeover = true` — compaction steps are
    * pure functions of the current tables, so the re-run completes what
    * the crash interrupted.
    */
  def compactIvfDeltas(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, includeLatest: Boolean = false,
      takeover: Boolean = false): Unit = {
    import graft.operators.Similarity.readParquetIfAny
    import graft.operators.AtomicBatches
    // nothing staged and no crashed pass to resume: skip the lock — the
    // common poll-compact loop must not churn marker creates
    if (readParquetIfAny(spark, s"$indexPath/deltas").isEmpty &&
        readParquetIfAny(spark, s"$indexPath/tombstones").isEmpty &&
        !AtomicBatches.maintenanceActive(spark, indexPath)) return
    AtomicBatches.withMaintenanceLock(spark, indexPath, takeover) {
      compactIvfDeltasBody(spark, indexPath, includeLatest)
    }
  }

  private def compactIvfDeltasBody(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, includeLatest: Boolean): Unit = {
    import graft.operators.Similarity.readParquetIfAny
    import org.apache.spark.sql.graft.Bridge
    val deltasOpt = readParquetIfAny(spark, s"$indexPath/deltas")
    val tombsOpt = readParquetIfAny(spark, s"$indexPath/tombstones")
    if (deltasOpt.isEmpty && tombsOpt.isEmpty) return
    val maxBatch = deltasOpt
      .map(_.agg(max(col("batch_id"))).head.get(0))
      .flatMap(Option(_)).map(_.toString.toLong).getOrElse(-1L)
    val baseOpt = readParquetIfAny(spark, s"$indexPath/cells")
    // layout-generic: (id, <payload...>, cell) — v for the flat index,
    // codes for the PQ index ([[continuousPqAppend]] deltas)
    val refCols = baseOpt.map(_.columns)
      .orElse(deltasOpt.map(_.drop("batch_id").columns))
      .getOrElse(return) // tombstones over a rowless index: nothing to do
    val idCol = refCols.head
    val payload = refCols.filter(c => c != idCol && c != "cell").toSeq
    // the fold horizon: versions with batch_id < horizon are folded into
    // the base this compaction; the latest batch stays a delta for the
    // streaming replay contract unless includeLatest. A batch-only index
    // (no deltas channel) has NO latest batch to guard, so every
    // tombstone is resolvable now — without this, maxBatch = −1 would
    // make `up_to < horizon` unsatisfiable and compaction would silently
    // leave victim bytes on disk and tombstones pending forever (a
    // non-removal a takedown caller would never notice).
    val horizon =
      if (includeLatest || deltasOpt.isEmpty) Long.MaxValue else maxBatch
    // tombstones whose up_to lies BELOW the horizon are fully resolvable
    // now — and MUST be resolved now: a surviving version with batch_id
    // in (up_to, horizon) folds into the base at rank −1, where a stale
    // tombstone would wrongly kill it later. Tombstones at or above the
    // horizon keep guarding the unfolded latest batch and stay pending
    // (they also correctly kill every folded row: all folded batch_ids
    // are < horizon ≤ up_to).
    val applyKill = tombsOpt.map(_.filter(col("up_to") < lit(horizon))
      .groupBy(col(idCol)).agg(max(col("up_to")).as("__kill")))
    val committedOpt = deltasOpt
      .map(d => if (includeLatest) d else d.where(col("batch_id") < maxBatch))
      .map { committedAll =>
        // recency dedup WITHIN the committed deltas: the max-batch_id row
        // per id wins (deterministic — equal batch_ids only arise from
        // replays whose rows agree in value), carrying its rank for the
        // tombstone horizon check
        committedAll
          .groupBy(col(idCol))
          .agg(max_by(struct((payload :+ "cell").map(col): _*),
            col("batch_id")).as("__w"),
            max(col("batch_id").cast("long")).as("__b"))
          .select(col(idCol) +: (payload :+ "cell").map(c =>
            col(s"__w.$c").as(c)) :+ col("__b"): _*)
          .localCheckpoint(true) // read by touched-cells, prior-cells, fold
      }
    // committed winners minus the ones an applied tombstone kills
    val liveOpt = committedOpt.map { committed =>
      (applyKill match {
        case None => committed
        case Some(kill) => committed.join(kill, Seq(idCol), "left_outer")
          .filter(col("__kill").isNull || col("__kill") < col("__b"))
          .drop("__kill")
      }).drop("__b")
    }
    // ids whose BASE row must go: any committed winner (a delta beats
    // the base) and any applied-tombstone victim (base ranks −1 ≤ up_to)
    val removalIds = (committedOpt.map(_.select(col(idCol))).toSeq ++
      applyKill.map(_.select(col(idCol))).toSeq)
      .reduceOption(_ unionByName _).map(_.distinct())
      .getOrElse(return)
    // driver-bounded: ≤2^nBits distinct cells — the literal prunes the
    // base read to the touched partitions only. Tombstone victims and
    // re-ingested ids that MOVED cells both surface through the
    // column-pruned (id, cell) prior-cells pass over the base.
    val newCells = committedOpt.toSeq.flatMap(_.select("cell").distinct()
      .collect().map(_.getLong(0)))
    val priorCells = baseOpt.toSeq.flatMap { base =>
      // cast: a partition column read back from parquet may infer as int
      base.select(col(idCol), col("cell").cast("long").as("cell"))
        .join(removalIds, Seq(idCol), "left_semi")
        .select("cell").distinct().collect().map(_.getLong(0))
    }
    val touched = (newCells ++ priorCells).distinct.sorted
    if (touched.nonEmpty) {
      val existing = baseOpt match {
        case Some(base) =>
          base.filter(col("cell").isin(touched: _*))
            .select(col(idCol) +: (payload :+ "cell").map(col): _*)
            .join(removalIds, Seq(idCol), "left_anti")
        case None => liveOpt.get.limit(0)
      }
      val folded = liveOpt
        .map(existing.unionByName(_))
        .getOrElse(existing)
        .localCheckpoint(true)
      folded
        .repartition(col("cell")) // one file per touched cell
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("cell")
        .parquet(s"$indexPath/cells")
      val fs = new org.apache.hadoop.fs.Path(indexPath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      // dynamic overwrite only rewrites partitions PRESENT in the output:
      // a prior cell emptied by an update (its only rows were re-ingested
      // or deleted ids) keeps its stale directory — delete those explicitly
      val outCells = folded.select(col("cell").cast("long")).distinct()
        .collect().map(_.getLong(0)).toSet
      touched.filterNot(outCells).foreach { c =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$indexPath/cells/cell=$c"),
          true)
      }
      Bridge.releaseLocalCheckpoint(folded)
    }
    committedOpt.foreach(Bridge.releaseLocalCheckpoint)
    val fs = new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // prune the folded delta partitions at the directory granularity the
    // dynamic-overwrite writes use
    deltasOpt.foreach { _ =>
      val root = new org.apache.hadoop.fs.Path(s"$indexPath/deltas")
      if (fs.exists(root)) fs.listStatus(root).foreach { st =>
        val name = st.getPath.getName
        if (st.isDirectory && name.startsWith("batch_id=")) {
          val bid = scala.util.Try(name.stripPrefix("batch_id=").toLong)
          if (bid.toOption.exists(b => b < maxBatch || includeLatest))
            fs.delete(st.getPath, true)
        }
      }
    }
    // garbage-collect the APPLIED tombstones (their kills are physical
    // now); pending ones (up_to ≥ horizon) keep guarding the latest batch
    tombsOpt.foreach { ts =>
      val troot = new org.apache.hadoop.fs.Path(s"$indexPath/tombstones")
      if (includeLatest) fs.delete(troot, true)
      else {
        // materialize survivors BEFORE overwriting the table they read
        val pending = ts.filter(col("up_to") >= lit(horizon))
          .localCheckpoint(true)
        pending.write.mode("overwrite").parquet(troot.toString)
        Bridge.releaseLocalCheckpoint(pending)
      }
    }
  }

  /** Probe a [[continuousIvfAppend]]-maintained index: nearest-centroid
    * cell selection on the driver (≤2^nBits rows), then the
    * `Similarity.cellsCurrent` read the batch faces share — base cells (partition-pruned directories) ∪ un-compacted
    * deltas, de-duplicated on id by RECENCY (max delta batch_id wins;
    * the base ranks as batch −1), tombstone-killed versions dropped —
    * scored and top-k'd exactly like
    * [[graft.operators.Similarity.ivfTopKFromIndex]]: a stream-built
    * index answers identically to a batch-built one over the same rows.
    *
    * `rowFilter` is the batch faces' filtered-probe hook
    * ([[graft.operators.Similarity.ivfTopKJoinSQ8]] doc), applied AFTER
    * the recency dedup and the tombstone drop — the predicate sees the
    * index's CURRENT row per id, so a payload predicate can never
    * resurrect a superseded or deleted version — and before the top-k,
    * so the probe still returns k rows from the filtered candidate set.
    */
  def ivfTopKFromStreamIndex(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, idCol: String, queryVec: Seq[Double], k: Int,
      nProbe: Int = 4,
      rowFilter: DataFrame => DataFrame = identity): DataFrame = {
    import graft.operators.Similarity
    import graft.functions.{VectorFunctions => V}
    val cents = Similarity.readCentroids(spark, indexPath)
    val probes = Similarity.probeCells(cents, queryVec, nProbe)
    val q = typedLit(queryVec)
    rowFilter(Similarity.cellsCurrent(spark, indexPath, idCol,
        col("cell").isin(probes: _*))
        .select(col(idCol), col("v")))
      .select(col(idCol), round(V.cosine(col("v"), q), 6).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** [[continuousIvfAppend]] for a product-quantized index
    * ([[graft.operators.Similarity.ivfWriteIndexPQ]] layout): each
    * micro-batch is assigned to its nearest FROZEN coarse centroid and
    * encoded against the FROZEN codebooks
    * ([[graft.operators.Similarity.ivfAppendPQ]]'s exact rules, shared
    * code), landing as per-batch-id delta partitions with dynamic
    * overwrite — replay-safe, like every streaming face here. Deltas
    * carry (id, cell, codes): m bytes per vector in flight, which at
    * ingest volume is the difference between shipping the stream and
    * shipping 64× the stream. Compact with [[compactIvfDeltas]] (the
    * fold is layout-generic); probe with [[ivfPqTopKFromStreamIndex]];
    * codebook/centroid drift → offline [[graft.operators.Similarity
    * .ivfWriteIndexPQ]] rebuild + stream restart (the frozen
    * train-offline / score-online split).
    */
  def continuousPqAppend(vecs: DataFrame, idCol: String, vecCol: String,
      indexPath: String, checkpoint: String,
      compactEveryBatches: Int = 0): DataStreamWriter[Row] = {
    import graft.operators.Similarity
    vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        // frozen quantizer + codebooks re-read per batch, so an offline
        // rebuild that swaps them is picked up at the next batch boundary
        Similarity.pqDeltaRows(batch.toDF(), idCol, vecCol, indexPath)
          .withColumn("batch_id", lit(batchId))
          .repartition(col("cell")) // cell-coherent files — see above
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(s"$indexPath/deltas")
        if (compactEveryBatches > 0 && batchId > 0 &&
            batchId % compactEveryBatches == 0)
          compactIvfDeltas(spark, indexPath)
        ()
      }
  }

  /** [[ivfTopKFromStreamIndex]] for a [[continuousPqAppend]]-maintained
    * PQ index: the same shared
    * `Similarity.cellsCurrent` read (recency dedup, tombstone drop), with the
    * candidate cosine computed against the PQ reconstruction
    * ([[graft.operators.Similarity.ivfTopKFromIndexPQ]]'s asymmetric
    * distance) and the probe-cell selection the PQ faces' round-6 rule.
    * `rowFilter` as on [[ivfTopKFromStreamIndex]]: applied after the
    * recency dedup and tombstone drop, before the top-k.
    */
  def ivfPqTopKFromStreamIndex(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, idCol: String, queryVec: Seq[Double], k: Int,
      nProbe: Int = 4,
      rowFilter: DataFrame => DataFrame = identity): DataFrame = {
    import graft.operators.Similarity
    import graft.functions.{VectorFunctions => V}
    val cents = Similarity.readCentroids(spark, indexPath)
    val probes = Similarity.probeCellsRounded(cents, queryVec, nProbe)
    val q = typedLit(queryVec)
    rowFilter(Similarity.cellsCurrent(spark, indexPath, idCol,
        col("cell").isin(probes: _*))
        .select(col(idCol), col("codes")))
      .select(col(idCol), round(
        V.cosine(Similarity.pqReconstruct(spark, indexPath), q), 6)
        .as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Stream-stream inner join with watermark-bounded state (SURVEY §2.3
    * joins row): both sides buffer only rows newer than their watermark,
    * and the time-range condition lets Spark evict state as the
    * watermarks advance — without it a stream-stream join's state grows
    * forever.
    */
  def streamStreamJoin(left: DataFrame, right: DataFrame,
      keyCol: String, leftTs: String, rightTs: String,
      watermark: String, joinWindow: String): DataFrame = {
    require(leftTs != rightTs, "rename one side's timestamp column first")
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withColumnRenamed(keyCol, s"${keyCol}_r")
      .withWatermark(rightTs, watermark)
    l.join(r, expr(
      s"""$keyCol = ${keyCol}_r AND
          $rightTs >= $leftTs - INTERVAL $joinWindow AND
          $rightTs <= $leftTs + INTERVAL $joinWindow"""))
  }

  /** Left-outer stream-stream join: unmatched left rows are emitted with
    * nulls once the watermark proves no match can still arrive — the
    * "click with no purchase within the window" shape. Same state bounds
    * as the inner variant.
    */
  def streamStreamLeftJoin(left: DataFrame, right: DataFrame,
      keyCol: String, leftTs: String, rightTs: String,
      watermark: String, joinWindow: String): DataFrame = {
    require(leftTs != rightTs, "rename one side's timestamp column first")
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withColumnRenamed(keyCol, s"${keyCol}_r")
      .withWatermark(rightTs, watermark)
    l.join(r, expr(
      s"""$keyCol = ${keyCol}_r AND
          $rightTs >= $leftTs - INTERVAL $joinWindow AND
          $rightTs <= $leftTs + INTERVAL $joinWindow"""), "left_outer")
  }

  /** Full-outer stream-stream join: each side's unmatched rows are
    * emitted with nulls once BOTH watermarks prove no partner can still
    * arrive — the reconciliation shape (orders vs. payments, either side
    * may be missing). Same watermark-bounded state as the inner variant;
    * outputs for unmatched rows are naturally delayed by the watermark.
    */
  def streamStreamFullOuterJoin(left: DataFrame, right: DataFrame,
      keyCol: String, leftTs: String, rightTs: String,
      watermark: String, joinWindow: String): DataFrame = {
    require(leftTs != rightTs, "rename one side's timestamp column first")
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withColumnRenamed(keyCol, s"${keyCol}_r")
      .withWatermark(rightTs, watermark)
    l.join(r, expr(
      s"""$keyCol = ${keyCol}_r AND
          $rightTs >= $leftTs - INTERVAL $joinWindow AND
          $rightTs <= $leftTs + INTERVAL $joinWindow"""), "full_outer")
  }

  /** Collects per-batch observed metrics from streaming progress events —
    * the Prometheus-exporter seam (reference src/metrics.js:5-52 +
    * /metrics endpoint at listen.js:9-30). A real deployment forwards
    * `snapshot()` to a Prometheus registry or uses
    * spark.sql.streaming.metricsEnabled; the listener keeps the
    * reference's counter names verbatim.
    */
  final class PipelineMetricsListener
      extends org.apache.spark.sql.streaming.StreamingQueryListener {
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    private val totals = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    private val durationMs = new java.util.concurrent.atomic.AtomicLong()
    private val batches = new java.util.concurrent.atomic.AtomicLong()

    override def onQueryStarted(e: QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: QueryProgressEvent): Unit = {
      // merge every *_metrics observation by counter name — the chain's
      // "pipeline_metrics" and the decode guard's "decode_metrics" both
      // feed messages_error_total, like the reference's single registry
      e.progress.observedMetrics.forEach { (obsName, row) =>
        if (obsName.endsWith("_metrics")) {
          row.schema.fieldNames.foreach { name =>
            totals.merge(name, row.getAs[Long](name), (a, b) => a + b)
          }
        }
      }
      // processing-duration seam: the reference histograms per-message
      // duration (src/metrics.js:48-53); the closest per-batch analog is
      // triggerExecution time, exported as histogram sum/count
      Option(e.progress.durationMs.get("triggerExecution")).foreach { ms =>
        durationMs.addAndGet(ms)
        batches.incrementAndGet()
      }
    }
    def snapshot(): Map[String, Long] = {
      import scala.jdk.CollectionConverters._
      totals.asScala.toMap
    }
    /** (total trigger-execution seconds, batch count) for the duration
      * histogram exposition.
      */
    def durationSecondsAndBatches: (Double, Long) =
      (durationMs.get() / 1000.0, batches.get())
  }

  /** Output row of [[statefulRunningCount]]. */
  case class KeyCount(key: String, n: Long)

  /** Output row of [[statefulRunningAgg]]. */
  case class KeyAgg(key: String, n: Long, total: Double)

  private case class AggState(n: Long, total: Double)

  /** StatefulProcessor behind [[statefulRunningAgg]]: one typed
    * ValueState per key, optional TTL handled by the state store.
    */
  private class RunningAggProcessor(ttl: org.apache.spark.sql.streaming.TTLConfig)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, (String, Double), KeyAgg] {
    @transient private var state: org.apache.spark.sql.streaming.ValueState[AggState] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      state = getHandle.getValueState[AggState]("agg",
        org.apache.spark.sql.Encoders.product[AggState], ttl)
    override def handleInputRows(key: String, rows: Iterator[(String, Double)],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[KeyAgg] = {
      val prev = if (state.exists()) state.get() else AggState(0L, 0.0)
      var n = prev.n; var total = prev.total
      rows.foreach { r => n += 1; total += r._2 }
      state.update(AggState(n, total))
      Iterator(KeyAgg(key, n, total))
    }
  }

  /** Cross-batch running count+sum per key via `transformWithState` —
    * Spark 4's arbitrary-state API (typed state variables, store-managed
    * TTL, timers), the successor to (flat)MapGroupsWithState. Requires
    * the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass`), which also gives
    * the 100 TB state story: state lives off-heap/on-disk per partition
    * with changelog checkpointing, not in executor heap.
    *
    * `ttl` expires idle keys' state (processing-time) so unbounded key
    * spaces cannot grow state forever; pass None for no expiry.
    */
  def statefulRunningAgg(spark: org.apache.spark.sql.SparkSession,
      events: DataFrame, keyCol: String, valueCol: String,
      ttl: Option[java.time.Duration] = None): Dataset[KeyAgg] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig}
    val ttlConf = ttl.map(TTLConfig.apply).getOrElse(TTLConfig.NONE)
    val timeMode = if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    events.select(col(keyCol).cast("string"), col(valueCol).cast("double"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .transformWithState(new RunningAggProcessor(ttlConf),
        timeMode, OutputMode.Update())
  }

  /** Custom cross-batch state via flatMapGroupsWithState: a running count
    * per key that survives micro-batch boundaries — the primitive behind
    * any "counter/accumulator/session object per key" operator the
    * built-in aggregations can't express. State is one Long per key;
    * partitioned by key, so it scales horizontally with executors.
    */
  def statefulRunningCount(spark: org.apache.spark.sql.SparkSession,
      events: DataFrame, keyCol: String): Dataset[KeyCount] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupState
    events.select(col(keyCol).cast("string")).as[String]
      .groupByKey(identity)
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.NoTimeout())(
        (key: String, rows: Iterator[String], state: GroupState[Long]) => {
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          Iterator(KeyCount(key, n))
        })
  }
}
