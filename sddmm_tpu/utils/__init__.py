from sddmm_tpu.utils.check import check_values, CheckResult
from sddmm_tpu.utils.timing import Timer, time_jax_fn
from sddmm_tpu.utils.logger import RunLog

__all__ = ["check_values", "CheckResult", "Timer", "time_jax_fn", "RunLog"]
