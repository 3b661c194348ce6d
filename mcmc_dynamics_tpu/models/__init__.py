from .base import Runner, SamplerResult
from .constant import ConstantFit, ConstantFitGB
from .model import ModelFit, ModelFitConstantBackground, ModelFitGB
from .double_model import DoubleModelFit, DoubleModelFitGB
from .jam import AnalyticalProfiles, Axisymmetric, ChemoProfiles

__all__ = [
    "Runner", "SamplerResult",
    "ConstantFit", "ConstantFitGB",
    "ModelFit", "ModelFitGB", "ModelFitConstantBackground",
    "DoubleModelFit", "DoubleModelFitGB",
    "Axisymmetric", "AnalyticalProfiles", "ChemoProfiles",
]
