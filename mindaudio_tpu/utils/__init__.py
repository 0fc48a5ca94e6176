"""Training-infrastructure utilities (masks, batching helpers, decoding)."""

from . import common, mask  # noqa: F401
