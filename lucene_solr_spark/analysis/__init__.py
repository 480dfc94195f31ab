from .analyzers import (  # noqa: F401
    SIMPLE_TOKENS_SQL_SPARK,
    simple_tokens_col,
    simple_tokens_sql,
    standard_tokenize,
    standard_tokenize_udf,
)
