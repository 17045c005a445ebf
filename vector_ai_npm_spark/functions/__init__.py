from vector_ai_npm_spark.functions.numeric import dsum, davg
from vector_ai_npm_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
)

__all__ = ["dsum", "davg", "cosine_similarity", "dot_product", "l2_norm"]
