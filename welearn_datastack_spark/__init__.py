"""welearn_datastack_spark — PySpark-native engine with the query and
data-processing capabilities of CyberCRI/welearn-datastack.

Not a port: the reference (single-node Python workers over PostgreSQL,
Argo CSV fan-out) is re-expressed Spark-first — state log as an event
DataFrame with window arg-max, model resolution as ranked broadcast
joins, byte-budget admission as a prefix-sum window, extraction plugins
as Arrow-batched mapInPandas stages, keyword get-or-create as
MERGE-style anti-joins, vector sync as overwrite-by-key.
"""

__version__ = "0.1.0"
