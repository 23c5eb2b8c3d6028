"""sick_ray — Ray-Data-native web-scale dedup engine.

Re-imagines 7mind/sick's content-addressed deduplication (hash-consing of
identical JSON subtrees, /root/reference) as a three-stage near-duplicate
detection + clustering pipeline over Parquet web pages. See README.md and
SURVEY.md §8 for the operator inventory mapping.
"""

from sick_ray.config import AnnConfig, DedupConfig

__all__ = ["AnnConfig", "DedupConfig"]
__version__ = "0.1.0"
