"""Source connectors.

Batch: format-agnostic table readers over parquet/csv/json with uniform
options (``read_table``). Streaming sources live in
``mrcond_spark.streaming.source`` (MongoDB change stream + file replay) and
are re-exported here so the package has one sources surface.
"""

from ..streaming.source import file_replay_stream, mongo_change_stream
from .batch import read_table, write_table

__all__ = ["read_table", "write_table", "file_replay_stream", "mongo_change_stream"]
