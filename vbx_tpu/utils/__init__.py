"""Shared utilities: bucketing/padding for ragged batches, timers,
structured run logs."""

from vbx_tpu.utils.bucketing import pad_to_buckets, round_up  # noqa: F401
from vbx_tpu.utils.timing import Timer  # noqa: F401
