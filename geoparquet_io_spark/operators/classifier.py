"""Distributed linear-classifier training (quality-filter style).

A training-data pipeline's quality gate is typically a tiny linear
model over cheap text statistics (the fasttext-classifier pattern) —
what matters at 100 TB is the TRAINING shape: full-batch gradient
descent where each iteration is ONE map-side-combined aggregation
(``n_features`` partial sums per partition; only the weight vector —
bytes — visits the driver between steps), then a map-only scoring pass.
Same loop shape as operators/similarity.py:kmeans_fit_distributed.

Determinism across engines (so SQL oracles can replay training
exactly):
- the link is the ALGEBRAIC sigmoid ``0.5 * (1 + z / (1 + |z|))`` —
  add/mul/div/abs are IEEE-correctly-rounded everywhere, unlike
  ``exp`` whose libm vs JVM implementations differ by ULPs;
- weights are rounded to ``round_digits`` after every step, absorbing
  the engine-sensitive summation order of the gradient (the only
  non-reproducible float op in the loop);
- ``z`` is a left-associated fold over features — identical op order
  in both engines.

Beyond-reference operator (the reference has no model training).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fast_sigmoid(z: Column) -> Column:
    """0.5 * (1 + z / (1 + |z|)) — exact-IEEE sigmoid-shaped link."""
    return F.lit(0.5) * (F.lit(1.0) + z / (F.lit(1.0) + F.abs(z)))


def _z(weights: list[float], feature_cols: list[Column]) -> Column:
    if len(weights) != len(feature_cols):
        # zip would silently truncate — scoring with a mismatched model
        # ignores trailing features with no signal at all
        raise ValueError(
            f"{len(weights)} weights for {len(feature_cols)} features")
    z = F.lit(float(weights[0])) * feature_cols[0]
    for w, x in zip(weights[1:], feature_cols[1:]):
        z = z + F.lit(float(w)) * x
    return z


def linear_classifier_train(
    df: DataFrame,
    feature_columns: list[str],
    label_column: str,
    lr: float = 0.5,
    iterations: int = 3,
    round_digits: int = 6,
    init: list[float] | None = None,
) -> list[float]:
    """Full-batch gradient descent: ``w -= lr * mean((p - y) * x)`` with
    the fast-sigmoid link.  One Spark job per iteration; driver state is
    the weight vector only."""
    k = len(feature_columns)
    w = [round(float(x), round_digits) for x in (init or [0.0] * k)]
    xs = [F.col(c).cast("double") for c in feature_columns]
    y = F.col(label_column).cast("double")
    # rows with a null label or any null feature carry no gradient:
    # F.sum would skip them while count(*) counted them, silently
    # scaling every gradient down by the null fraction
    cond = y.isNotNull()
    for x in xs:
        cond = cond & x.isNotNull()
    train = df.filter(cond)
    for _ in range(iterations):
        p = fast_sigmoid(_z(w, xs))
        aggs = [F.sum((p - y) * xs[j]).alias(f"g{j}") for j in range(k)]
        row = train.agg(*aggs, F.count("*").alias("n")).collect()[0]
        n = row["n"]
        if not n:
            raise ValueError(
                "linear_classifier_train: no trainable rows (input is "
                "empty or every row has a null label/feature)")
        w = [round(w[j] - lr * row[f"g{j}"] / n, round_digits)
             for j in range(k)]
    return w


def linear_classifier_score(df: DataFrame, weights: list[float],
                            feature_columns: list[str],
                            score_column: str = "score",
                            round_digits: int | None = 6) -> DataFrame:
    """Map-only scoring pass with trained (literal) weights."""
    xs = [F.col(c).cast("double") for c in feature_columns]
    p = fast_sigmoid(_z(weights, xs))
    if round_digits is not None:
        p = F.round(p, round_digits)
    return df.withColumn(score_column, p)


def classifier_model_table(
    spark,
    df: DataFrame,
    feature_columns: list[str],
    label_column: str,
    lr: float = 0.5,
    iterations: int = 3,
    round_digits: int = 6,
) -> DataFrame:
    """Train, then report the model as scalars — one row per feature
    with its weight plus the (identical per row) train accuracy, the
    shape a model registry persists and a SQL engine can diff."""
    w = linear_classifier_train(df, feature_columns, label_column,
                                lr=lr, iterations=iterations,
                                round_digits=round_digits)
    scored = linear_classifier_score(df, w, feature_columns,
                                     round_digits=None)
    y = F.col(label_column).cast("double")
    pred = (F.col("score") >= 0.5).cast("double")
    # accuracy over LABELED rows only: null labels can never be
    # "correct", so counting them in n deflated the metric
    row = scored.filter(y.isNotNull()).agg(
        F.sum((pred == y).cast("long")).alias("correct"),
        F.count("*").alias("n"),
    ).collect()[0]
    if not row["n"]:
        raise ValueError("classifier_model_table: no labeled rows")
    acc = round((row["correct"] or 0) / row["n"], round_digits)
    rows = [(j, feature_columns[j], float(w[j]), acc, int(row["n"]))
            for j in range(len(feature_columns))]
    return spark.createDataFrame(
        rows, "feature int, feature_name string, weight double, "
              "accuracy double, n_docs bigint")
