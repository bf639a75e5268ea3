from .novelty import (
    bloom_novelty_foreach_batch,
    compact_bloom_index,
    compact_minhash_index,
    minhash_novelty_foreach_batch,
)
from .cdc import (
    cdc_upsert_foreach_batch,
    compact_cdc_state,
    read_cdc_state,
)
from .stateful import streaming_quality_gate
from .validation import validate_stream, observed_validation

__all__ = [
    "validate_stream",
    "observed_validation",
    "bloom_novelty_foreach_batch",
    "compact_bloom_index",
    "compact_minhash_index",
    "minhash_novelty_foreach_batch",
    "streaming_quality_gate",
    "cdc_upsert_foreach_batch",
    "read_cdc_state",
    "compact_cdc_state",
]
