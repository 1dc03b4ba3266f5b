"""Trained document-quality classifier (scale extension, pyspark.ml).

The fastText-classifier slot in a real curation stack (e.g. the
GPT-3/LLaMA "quality classifier" stage): train a linear model on cheap
labels and score the whole corpus with it. The environment has no
fastText/torch, so the classifier is the idiomatic Spark equivalent —
``HashingTF -> IDF -> LogisticRegression`` over whitespace tokens, all
JVM-side, seeded for reproducibility.

Labels come from the deterministic heuristic score
(:func:`bigdatalab_spark.scale.textqa.quality_features`): documents at
or above ``label_threshold`` are "good". That makes this a *distilled*
classifier (model-of-a-heuristic) here, but the plumbing — feature
hashing width, pipeline persistence, train/score split hygiene,
probability extraction — is exactly what a real labeled set would use,
and the test gates on held-out AUC, not train fit.

Scale shape: training runs on the (sampled) train split only —
LogisticRegression with L-BFGS is a handful of treeAggregate passes over
the feature vectors, each a map-side-combined reduction, no shuffle of
raw text. Scoring is a narrow mapPartitions of the broadcast
coefficient vector (2^18 doubles — megabytes) over the corpus: at
100 TB it runs at scan speed. Feature hashing (no vocabulary build)
keeps the model size independent of corpus size.

Model outputs are floats (dot products), so the registered query is
rows-only by design, like the trained-KMeans IVF — the gate checks
rows>0 and pytest gates ordering quality (AUC) instead of value hashes.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import HashingTF, IDF, Tokenizer
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: heuristic-score cutoff separating "good" from "bad" labels — near the
#: corpus median so classes stay balanced
DEFAULT_LABEL_THRESHOLD = 0.65

#: feature-hash width; 2^18 keeps collisions rare at web-corpus vocab
#: sizes while the coefficient vector stays ~2 MB (broadcast-friendly)
DEFAULT_NUM_FEATURES = 1 << 18


def label_documents(
    docs: DataFrame,
    text_col: str = "text",
    label_threshold: float = DEFAULT_LABEL_THRESHOLD,
) -> DataFrame:
    """Attach the heuristic 0/1 quality label to ``docs``.

    One narrow projection — :func:`quality_features` is pure column
    expressions, joined back by construction (same row), no shuffle.
    """
    from bigdatalab_spark.scale.textqa import quality_features

    feats = quality_features(docs, text_col).select(
        "doc_id", (F.col("quality_score") >= label_threshold).cast("double").alias("label")
    )
    return docs.join(feats, "doc_id")


def build_quality_pipeline(
    text_col: str = "text",
    num_features: int = DEFAULT_NUM_FEATURES,
    seed: int = 7,
) -> Pipeline:
    """Tokenize -> HashingTF -> IDF -> LogisticRegression pipeline.

    ``Tokenizer`` lower-cases and splits on whitespace (the corpus
    tokenization convention); ``HashingTF`` needs no vocabulary pass,
    so the pipeline is two jobs (IDF fit + LR fit), both aggregations.
    """
    tok = Tokenizer(inputCol=text_col, outputCol="_words")
    tf = HashingTF(inputCol="_words", outputCol="_tf", numFeatures=num_features)
    idf = IDF(inputCol="_tf", outputCol="features")
    lr = LogisticRegression(
        featuresCol="features",
        labelCol="label",
        maxIter=25,
        regParam=1e-3,
        standardization=False,
    )
    # LogisticRegression's L-BFGS is deterministic given fixed input
    # partitioning; `seed` is accepted for signature stability (none of
    # these stages sample, so there is nothing to seed today).
    _ = seed
    return Pipeline(stages=[tok, tf, idf, lr])


def train_quality_classifier(
    train_docs: DataFrame,
    text_col: str = "text",
    label_threshold: float = DEFAULT_LABEL_THRESHOLD,
    num_features: int = DEFAULT_NUM_FEATURES,
    seed: int = 7,
    model_dir: str | None = None,
) -> PipelineModel:
    """Fit the quality pipeline on labeled training documents.

    The fitted model is round-tripped through ML persistence before
    being returned: a freshly-fit ``LogisticRegressionModel`` carries a
    ``trainingSummary`` that references the live ``SparkSession``, and
    any downstream plan that serializes the model's transform closure
    into a task (e.g. a broadcast join over the scored frame) then
    fails with ``NotSerializableException: ObservationManager`` via the
    model -> summary -> session chain. Save/load drops the summary —
    and is the shape a real pipeline uses anyway (train once, persist,
    serve the loaded model).

    ``model_dir`` is where the round-trip happens. ML writer/reader
    paths are resolved by the CLUSTER (Hadoop FS API), so on a real
    deployment it must be shared storage (HDFS/S3/...), configured
    either per call or session-wide via the
    ``spark.bigdatalab.modelDir`` conf. When neither is set we fall
    back to a driver-local tempdir, which is correct only in local
    mode (driver == executors == one filesystem) — exactly the test
    environment — and the tempdir is removed after loading.
    """
    import shutil
    import tempfile

    labeled = label_documents(train_docs, text_col, label_threshold)
    model = build_quality_pipeline(text_col, num_features, seed).fit(labeled)
    if model_dir is None:
        model_dir = train_docs.sparkSession.conf.get(
            "spark.bigdatalab.modelDir", None
        )
    cleanup = None
    if model_dir is None:
        model_dir = cleanup = tempfile.mkdtemp(prefix="quality-lr-")
    try:
        # unique leaf per call: concurrent trainings sharing the
        # session-wide modelDir must not clobber (and then load) each
        # other's round-trip
        import uuid

        path = f"{model_dir}/quality-lr-model-{uuid.uuid4().hex}"
        model.write().overwrite().save(path)
        return PipelineModel.load(path)
    finally:
        if cleanup is not None:
            shutil.rmtree(cleanup, ignore_errors=True)


def score_documents(
    model: PipelineModel, docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Score documents: ``(doc_id, p_good, prediction)``.

    ``p_good`` is the class-1 probability extracted JVM-side via
    ``vector_to_array`` — no Python on the scoring path.
    """
    from pyspark.ml.functions import vector_to_array

    return model.transform(docs).select(
        F.col(id_col).alias("doc_id"),
        vector_to_array("probability")[1].alias("p_good"),
        F.col("prediction").alias("prediction"),
    )


#: session-scoped fitted-model store (same contract as the PQ codebook
#: memo, scale/pq.py): train once per (session, corpus), serve every
#: subsequent scoring batch from the registry. Bounded FIFO.
_MODEL_MEMO: dict[tuple, PipelineModel] = {}
_MEMO_MAX_ENTRIES = 8


def train_quality_classifier_cached(
    train_docs: DataFrame,
    corpus_key: tuple,
    text_col: str = "text",
    label_threshold: float = DEFAULT_LABEL_THRESHOLD,
    num_features: int = DEFAULT_NUM_FEATURES,
    seed: int = 7,
) -> PipelineModel:
    """Memoized :func:`train_quality_classifier`; ``corpus_key`` must
    identify the training corpus CONTENTS — callers use
    ``(applicationId, corpus_fingerprint(sf_dir, "documents"))``
    (sources/readers.py) so mid-session data changes retrain instead
    of serving a stale model."""
    memo_key = (corpus_key, text_col, label_threshold, num_features, seed)
    if memo_key not in _MODEL_MEMO:
        while len(_MODEL_MEMO) >= _MEMO_MAX_ENTRIES:
            _MODEL_MEMO.pop(next(iter(_MODEL_MEMO)))
        _MODEL_MEMO[memo_key] = train_quality_classifier(
            train_docs, text_col, label_threshold, num_features, seed
        )
    return _MODEL_MEMO[memo_key]
