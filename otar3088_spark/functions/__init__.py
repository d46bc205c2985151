from otar3088_spark.functions.text import (  # noqa: F401
    clean_text_expr,
    is_header_expr,
    sentence_split_expr,
    offsets_expr,
    token_core_expr,
)
