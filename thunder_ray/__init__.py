"""thunder_ray — a Ray-Data-native time-series rollup / downsample / retention
engine with the query capabilities of thunder-project/thunder, re-expressed
over Parquet tables of pre-tokenized training sequences.

See SURVEY.md for the blueprint and BASELINE.json for the north rule.
"""

__version__ = "0.1.0"
