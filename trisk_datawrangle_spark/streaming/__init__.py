"""Streaming surface.

The reference is batch-only (SURVEY.md §2.12): no watermarks, stream
windows, or stateful operators exist in trisk.datawrangle, so no §2
inventory entry depends on streaming. This module carries the batch
time-bucketing helper used on the ``events`` table; the same
``F.window`` expression works unchanged under ``readStream`` +
watermark if a streaming deployment ever needs it.
"""

from trisk_datawrangle_spark.streaming.windows import tumbling_agg  # noqa: F401
