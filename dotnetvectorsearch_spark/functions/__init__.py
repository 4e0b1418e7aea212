from dotnetvectorsearch_spark.functions.vector import (  # noqa: F401
    cosine_similarity,
    dot,
    l2_norm,
    l2_normalize,
    sq_sum,
)
from dotnetvectorsearch_spark.functions.text import (  # noqa: F401
    combined_text,
    fingerprint,
    with_task_prefix,
)
