from hdfe_spark.functions.hashing import (
    kgram_hashes_np,
    make_minhash_udf,
    make_simhash_udf,
    token_hashes_np,
)

__all__ = [
    "kgram_hashes_np",
    "token_hashes_np",
    "make_minhash_udf",
    "make_simhash_udf",
]
