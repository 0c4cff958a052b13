from .linalg import cinv, csolve

__all__ = ["cinv", "csolve"]
