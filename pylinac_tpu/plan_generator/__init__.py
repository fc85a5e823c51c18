from .dicom import (
    FluenceMode,
    GantryDirection,
    HalcyonBeam,
    HalcyonPlanGenerator,
    OvertravelError,
    PlanGenerator,
    Stack,
    TrueBeamBeam,
    TrueBeamPlanGenerator,
)
from .fluence import generate_fluences, plot_fluences
from .mlc import MLCShaper
