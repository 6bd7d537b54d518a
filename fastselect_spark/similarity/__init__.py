from fastselect_spark.similarity.ann import cosine_topk, cosine_topk_lsh  # noqa: F401
