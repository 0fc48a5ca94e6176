"""On-device (JAX/XLA/Pallas) DSP ops — the TPU fast path of the data layer."""

from . import filterbanks  # noqa: F401
