from flagembedding_spark.functions.tokenize import (
    code_tokens,
    sanitize_queries,
    whitespace_tokens,
)

__all__ = ["whitespace_tokens", "code_tokens", "sanitize_queries"]
