from fastselect_spark.similarity.ann import cosine_topk, cosine_topk_lsh  # noqa: F401
from fastselect_spark.similarity.ivf import (  # noqa: F401
    cosine_topk_ivf,
    ivf_assign,
    kmeans_clusters,
    train_ivf_centroids,
)
from fastselect_spark.similarity.pq import (  # noqa: F401
    pq_encode,
    pq_topk,
    train_pq_codebooks,
    train_pq_codebooks_numpy,
)
from fastselect_spark.similarity.pca import (  # noqa: F401
    pca_project,
    train_pca,
    train_pca_numpy,
)
from fastselect_spark.similarity.mmr import mmr_rerank, pool_pair_sims  # noqa: F401
from fastselect_spark.similarity.fusion import (  # noqa: F401
    pool_embeddings,
    rrf_fuse,
)
from fastselect_spark.similarity.mmr import embedding_health  # noqa: F401
from fastselect_spark.similarity.quantize import (  # noqa: F401
    sq8_topk,
    sq8_topk_ivf,
    sq_encode,
    train_sq_scale,
)
