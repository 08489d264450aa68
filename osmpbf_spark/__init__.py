"""osmpbf_spark — PySpark-native OSM PBF decode + spatial-join/tiling engine.

A brand-new engine (not a port) with the capabilities of b-r-u/osmpbf,
re-expressed Spark-first: vectorized Arrow decode of PBF fileblocks from an
interleaved-documents table, H3-like grid / S2 cell indexing, PIP joins,
grid kNN, raster-tile assignment, plus large-scale training-data pipeline
operators (dedup, similarity search, text analysis). See SURVEY.md.
"""

__version__ = "0.1.0"
