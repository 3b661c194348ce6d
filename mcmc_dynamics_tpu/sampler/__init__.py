from .stretch import (EnsembleResult, EnsembleState, as_batched, init_state,
                      key_from_arrays, key_to_arrays, make_key, run_ensemble,
                      stretch_step)
from .diagnostics import (AutocorrError, autocorr_time, effective_sample_size,
                          gelman_rubin)
from .tempered import (TemperedResult, TemperedState, init_tempered, log_evidence,
                       make_beta_ladder, run_tempered)
from .hmc import HMCResult, HMCState, init_hmc, run_hmc

__all__ = [
    "EnsembleResult", "EnsembleState", "init_state", "run_ensemble", "stretch_step",
    "as_batched", "make_key", "key_to_arrays", "key_from_arrays",
    "AutocorrError", "autocorr_time", "effective_sample_size", "gelman_rubin",
    "TemperedState", "TemperedResult", "init_tempered", "run_tempered",
    "make_beta_ladder", "log_evidence",
    "HMCState", "HMCResult", "init_hmc", "run_hmc",
]
