from .lnlike_kernels import (constant_lnlike_batched,
                             constant_mixture_lnlike_batched,
                             model_lnlike_batched)
from .background_kernel import background_logsumexp

__all__ = ["constant_lnlike_batched", "constant_mixture_lnlike_batched",
           "model_lnlike_batched",
           "background_logsumexp"]
from .sufficient import ConstantSufficientStats

__all__.append("ConstantSufficientStats")
