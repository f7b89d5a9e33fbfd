"""planet_search_spark — a from-scratch PySpark-native inverted-index build
and BM25 query engine with the query semantics of IsraelHikingMap/planet-search
(reference read-only at /root/reference), re-expressed Spark-first over
tables of multi-turn transcripts (conv_id, turn_idx, role, text, tool, ts).
"""
__version__ = "0.1.0"
