from . import attention, embeddings, kv_cache, rope, scheduler  # noqa: F401
