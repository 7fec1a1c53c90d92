from thermalporous_tpu.models.base import ProblemData, ThermalModelBase, make_problem_data
from thermalporous_tpu.models.singlephase import SinglePhaseModel
from thermalporous_tpu.models.twophase import TwoPhaseModel

__all__ = [
    "ProblemData",
    "ThermalModelBase",
    "make_problem_data",
    "SinglePhaseModel",
    "TwoPhaseModel",
]
