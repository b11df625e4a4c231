from .tables import read_table
from .mapping import src_recent_tracks

__all__ = ["read_table", "src_recent_tracks"]
