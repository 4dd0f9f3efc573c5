from biodata_pipeline_spark.functions.vector import cosine, dot, l2_norm
from biodata_pipeline_spark.functions import textfn

__all__ = ["dot", "l2_norm", "cosine", "textfn"]
