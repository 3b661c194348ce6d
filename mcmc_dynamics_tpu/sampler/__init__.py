from .stretch import (EnsembleResult, EnsembleState, as_batched, init_state,
                      key_from_arrays, key_to_arrays, make_key, run_ensemble,
                      stretch_step)
from .diagnostics import autocorr_time, effective_sample_size, gelman_rubin

__all__ = [
    "EnsembleResult", "EnsembleState", "init_state", "run_ensemble", "stretch_step",
    "as_batched", "make_key", "key_to_arrays", "key_from_arrays",
    "autocorr_time", "effective_sample_size", "gelman_rubin",
]
