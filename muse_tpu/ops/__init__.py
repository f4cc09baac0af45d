from .lbfgs import batched_lbfgs, LbfgsResult

__all__ = ["batched_lbfgs", "LbfgsResult"]
