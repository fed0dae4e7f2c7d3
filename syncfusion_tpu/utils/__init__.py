"""Misc utilities (the reference main/utils.py equivalents)."""

from syncfusion_tpu.utils.misc import (
    retry_if_error,
    seed_everything,
    count_params,
    log_hyperparameters,
)
from syncfusion_tpu.ops.quantize import float32_to_int16, int16_to_float32
