from .local import LocalSearchEngine, ParquetIndex

__all__ = ["LocalSearchEngine", "ParquetIndex"]
