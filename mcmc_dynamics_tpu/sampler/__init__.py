from .stretch import (EnsembleResult, EnsembleState, init_state, run_ensemble,
                      stretch_step)
from .diagnostics import autocorr_time, effective_sample_size, gelman_rubin

__all__ = [
    "EnsembleResult", "EnsembleState", "init_state", "run_ensemble", "stretch_step",
    "autocorr_time", "effective_sample_size", "gelman_rubin",
]
