from xf_spark.functions.textcore import (
    canonicalize_for_embedding,
    generate_prefixes,
    tokenize,
)
from xf_spark.functions.hash_embed import hash_embed, hash_embed_batch

__all__ = [
    "tokenize",
    "generate_prefixes",
    "canonicalize_for_embedding",
    "hash_embed",
    "hash_embed_batch",
]
