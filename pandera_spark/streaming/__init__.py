from .validation import validate_stream, observed_validation

__all__ = ["validate_stream", "observed_validation"]
