from .vtu import VTUCollection
from .csvio import CsvWriter
from .checkpoint import save_sharded, load_sharded

__all__ = ["VTUCollection", "CsvWriter", "save_sharded", "load_sharded"]
