from .ale import AleMap

__all__ = ["AleMap"]
