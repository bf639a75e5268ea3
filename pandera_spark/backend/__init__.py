from .runner import run_validation

__all__ = ["run_validation"]
