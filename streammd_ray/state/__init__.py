from .checkpoint import run_with_checkpoint

__all__ = ["run_with_checkpoint"]
