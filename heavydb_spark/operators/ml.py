"""ML table functions (SURVEY.md §2.10: MLTableFunctions.hpp —
kmeans, linear_reg_fit/coefs, ml_reg_predict, r2_score, pca_fit).

Two tiers:
- closed-form single-feature regression + r2: plain aggregates
  (covar/var), fully distributed, oracle-checkable against DuckDB's
  regr_* functions;
- pyspark.ml pipelines (KMeans, multi-feature LinearRegression, PCA):
  the MLlib path (gated behind import-try; rows-only verification).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def linear_reg_fit(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Single-feature OLS via moment aggregates — one distributed agg,
    no driver math. Mirrors linear_reg_fit/linear_reg_coefs output
    (coef_idx, coef): idx 0 = intercept, 1 = slope."""
    stats = df.agg(
        F.covar_samp(x_col, y_col).alias("cxy"),
        F.var_samp(x_col).alias("vx"),
        F.avg(x_col).alias("mx"),
        F.avg(y_col).alias("my"),
    )
    slope = F.col("cxy") / F.col("vx")
    return stats.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("coef_idx"),
                    (F.col("my") - slope * F.col("mx")).alias("coef"),
                ),
                F.struct(F.lit(1).alias("coef_idx"), slope.alias("coef")),
            )
        ).alias("c")
    ).select("c.coef_idx", "c.coef")


def reg_predict(
    df: DataFrame, x_col: str, intercept: float, slope: float
) -> DataFrame:
    """ml_reg_predict analogue for the single-feature model."""
    return df.withColumn(
        "prediction", F.lit(intercept) + F.lit(slope) * F.col(x_col)
    )


def r2_score(df: DataFrame, y_col: str, pred_col: str) -> DataFrame:
    """r2_score UDTF analogue: 1 - SS_res/SS_tot, one aggregate pass."""
    meany = df.agg(F.avg(y_col).alias("m")).first()["m"]
    return df.agg(
        (
            1
            - F.sum(F.pow(F.col(y_col) - F.col(pred_col), 2))
            / F.sum(F.pow(F.col(y_col) - F.lit(meany), 2))
        ).alias("r2")
    )


def kmeans_fit(
    df: DataFrame,
    vec_col: str,
    k: int = 4,
    seed: int = 42,
    max_iter: int = 10,
) -> DataFrame:
    """tf_kmeans analogue over an array<float> column via pyspark.ml.
    Returns (id-preserving) cluster assignments."""
    try:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError("pyspark.ml unavailable") from exc

    feat = df.withColumn("features", array_to_vector(F.col(vec_col)))
    model = KMeans(k=k, seed=seed, maxIter=max_iter).fit(feat)
    return model.transform(feat).drop("features").withColumnRenamed(
        "prediction", "cluster_id"
    )


def pca_project(
    df: DataFrame, vec_col: str, k: int = 2
) -> DataFrame:
    """PCA_PROJECT analogue (MLPredictCodegen.cpp / PCA table fns)."""
    try:
        from pyspark.ml.feature import PCA
        from pyspark.ml.functions import array_to_vector, vector_to_array
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError("pyspark.ml unavailable") from exc

    feat = df.withColumn("features", array_to_vector(F.col(vec_col)))
    model = PCA(k=k, inputCol="features", outputCol="pca").fit(feat)
    return (
        model.transform(feat)
        .withColumn("pca_arr", vector_to_array(F.col("pca")))
        .drop("features", "pca")
    )


def tree_reg_fit_predict(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    kind: str = "random_forest",
    seed: int = 42,
) -> DataFrame:
    """decision_tree/gbt/random_forest_reg_fit + ml_reg_predict
    (MLTableFunctions.hpp) via pyspark.ml regressors: fit on the input,
    return (row features..., prediction). Distributed fit; prediction is
    a model.transform (JVM-side), never a driver loop."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import (
        DecisionTreeRegressor,
        GBTRegressor,
        RandomForestRegressor,
    )

    reg_cls = {
        "decision_tree": DecisionTreeRegressor,
        "gbt": GBTRegressor,
        "random_forest": RandomForestRegressor,
    }[kind]
    va = VectorAssembler(inputCols=feature_cols, outputCol="features")
    assembled = va.transform(df)
    kwargs = {"labelCol": label_col, "featuresCol": "features", "seed": seed}
    model = reg_cls(**kwargs).fit(assembled)
    return model.transform(assembled).select(
        *feature_cols, label_col, F.col("prediction")
    )


def r2_score(df: DataFrame, label_col: str, pred_col: str) -> DataFrame:
    """r2_score UDTF analogue: 1 - SS_res/SS_tot as one aggregate."""
    mean_y = F.avg(label_col)
    ss_res = F.sum(
        (F.col(label_col) - F.col(pred_col)) * (F.col(label_col) - F.col(pred_col))
    )
    stats = df.agg(
        ss_res.alias("ss_res"),
        F.sum(F.col(label_col) * F.col(label_col)).alias("syy"),
        F.sum(label_col).alias("sy"),
        F.count(F.lit(1)).alias("n"),
    )
    ss_tot = F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")
    return stats.select((1 - F.col("ss_res") / ss_tot).alias("r2"))
