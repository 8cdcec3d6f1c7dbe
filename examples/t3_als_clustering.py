"""Reference task T3 — ALS collaborative filtering + user-factor
clustering (`Collaborative Filtering Analysis/
als_clustering_analysis.py:28-140`), on the engine: temporal split,
ALS (default vs custom), RMSE/MAE/MSE, KMeans over user factors, and
the largest cluster's top-10 genres. MovieLens is private — synthetic
ratings/movies stand in.

Run: python examples/t3_als_clustering.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_ml_showcase_spark.ml import evaluate, fixtures, recommend
from spark_ml_showcase_spark.operators import splits
from spark_ml_showcase_spark.session import session_builder


def main() -> None:
    spark = session_builder("t3-als").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    ratings = fixtures.ratings(spark, n_ratings=4000)
    train, test = splits.temporal_split(
        ratings, "timestamp", "userId", 0.8, exact=True
    )
    train = train.cache()

    # default vs custom ALS (reference lines 41-78; reference-exact
    # custom params are rank=14/maxIter=17 — recommend.als(custom=True))
    for name, model in (
        ("default", recommend.als(custom=False, maxIter=8)),
        ("custom", recommend.als(custom=True, rank=8, maxIter=8)),
    ):
        fitted = model.fit(train)
        metrics = evaluate.regression_metrics(
            fitted.transform(test), label_col="rating"
        )
        print(name, {k: round(v, 4) for k, v in metrics.items()})

    # KMeans over user factors → largest cluster's genre top-10
    # (reference lines 120-140)
    fitted = recommend.als(custom=True, rank=8, maxIter=8).fit(train)
    factors = recommend.user_factors_vec(fitted)
    clustered = recommend.kmeans(k=5).fit(factors).transform(factors)
    movies = fixtures.movies(spark)
    recommend.largest_cluster_genre_top10(
        clustered, train, movies
    ).show(truncate=False)


if __name__ == "__main__":
    main()
