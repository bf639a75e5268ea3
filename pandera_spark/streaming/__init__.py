from .novelty import bloom_novelty_foreach_batch, compact_bloom_index
from .validation import validate_stream, observed_validation

__all__ = [
    "validate_stream",
    "observed_validation",
    "bloom_novelty_foreach_batch",
    "compact_bloom_index",
]
