from tinymapreduce_spark.functions.text import TOKEN_SPLIT_RE, tokens, words
from tinymapreduce_spark.functions.hashing import key2shard
from tinymapreduce_spark.functions.vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "TOKEN_SPLIT_RE",
    "tokens",
    "words",
    "key2shard",
    "cosine_similarity",
    "dot",
    "l2_norm",
]
