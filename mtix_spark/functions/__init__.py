from mtix_spark.functions.text import (  # noqa: F401
    tokenize,
    token_count,
    language_id,
    quality_score,
    doc_fingerprint,
)
from mtix_spark.functions.scalar import (  # noqa: F401
    clamp_year,
    sanitize_citation,
    replace_brackets,
    query_template,
    score_reason,
    extract_pub_year,
)
