"""pylinac-tpu: TPU-native medical-physics QA framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
jrkerns/pylinac: TG-142-style QA analysis of linac / CT / MR / NM images,
with host-side I/O and device-side (TPU) numerics.
"""

from ._hostmem import tune as _tune_host_allocator  # isort: skip

_tune_host_allocator()

from .version import __version__  # isort: skip

from .core import decorators, geometry, image, io, mask, profile, roi, utilities
from .core.profile import Centering
from .core.utilities import assign2machine, clear_data_files
from .field_analysis import (
    Device,
    DeviceFieldAnalysis,
    Edge,
    FieldAnalysis,
    Interpolation,
    Normalization,
    Protocol,
)

# Modules below are imported lazily on attribute access to keep import light;
# each mirrors a reference public symbol (reference pylinac/__init__.py:1-50).
_LAZY_IMPORTS = {
    "Starshot": ("pylinac_tpu.starshot", "Starshot"),
    "PicketFence": ("pylinac_tpu.picketfence", "PicketFence"),
    # batched one-dispatch session APIs (TPU-native additions)
    "StarshotBatch": ("pylinac_tpu.starshot", "StarshotBatch"),
    "analyze_star_batch": ("pylinac_tpu.starshot", "analyze_star_batch"),
    "PicketFenceBatch": ("pylinac_tpu.picketfence", "PicketFenceBatch"),
    "FieldAnalysisBatch": ("pylinac_tpu.field_analysis", "FieldAnalysisBatch"),
    "analyze_field_batch": ("pylinac_tpu.field_analysis", "analyze_field_batch"),
    "WinstonLutz": ("pylinac_tpu.winston_lutz", "WinstonLutz"),
    "WinstonLutz2D": ("pylinac_tpu.winston_lutz", "WinstonLutz2D"),
    "WinstonLutzMultiTargetMultiField": ("pylinac_tpu.winston_lutz", "WinstonLutzMultiTargetMultiField"),
    "DRGS": ("pylinac_tpu.vmat", "DRGS"),
    "DRMLC": ("pylinac_tpu.vmat", "DRMLC"),
    "DRCS": ("pylinac_tpu.vmat", "DRCS"),
    "CatPhan503": ("pylinac_tpu.ct", "CatPhan503"),
    "CatPhanBatch": ("pylinac_tpu.ct", "CatPhanBatch"),
    "CatPhan504": ("pylinac_tpu.ct", "CatPhan504"),
    "CatPhan600": ("pylinac_tpu.ct", "CatPhan600"),
    "CatPhan604": ("pylinac_tpu.ct", "CatPhan604"),
    "CatPhan700": ("pylinac_tpu.ct", "CatPhan700"),
    "ACRCT": ("pylinac_tpu.acr", "ACRCT"),
    "ACRMRILarge": ("pylinac_tpu.acr", "ACRMRILarge"),
    "QuartDVT": ("pylinac_tpu.quart", "QuartDVT"),
    "HypersightQuartDVT": ("pylinac_tpu.quart", "HypersightQuartDVT"),
    "TomoCheese": ("pylinac_tpu.cheese", "TomoCheese"),
    "CIRS062M": ("pylinac_tpu.cheese", "CIRS062M"),
    "GEHeliosCTDaily": ("pylinac_tpu.helios", "GEHeliosCTDaily"),
    "FieldProfileAnalysis": ("pylinac_tpu.field_profile_analysis", "FieldProfileAnalysis"),
    "Dynalog": ("pylinac_tpu.log_analyzer", "Dynalog"),
    "TrajectoryLog": ("pylinac_tpu.log_analyzer", "TrajectoryLog"),
    "MachineLogs": ("pylinac_tpu.log_analyzer", "MachineLogs"),
    "load_log": ("pylinac_tpu.log_analyzer", "load_log"),
    "DLG": ("pylinac_tpu.dlg", "DLG"),
    "LeedsTOR": ("pylinac_tpu.planar_imaging", "LeedsTOR"),
    "LeedsTORBlue": ("pylinac_tpu.planar_imaging", "LeedsTORBlue"),
    "StandardImagingQC3": ("pylinac_tpu.planar_imaging", "StandardImagingQC3"),
    "StandardImagingQCkV": ("pylinac_tpu.planar_imaging", "StandardImagingQCkV"),
    "LasVegas": ("pylinac_tpu.planar_imaging", "LasVegas"),
    "ElektaLasVegas": ("pylinac_tpu.planar_imaging", "ElektaLasVegas"),
    "DoselabMC2kV": ("pylinac_tpu.planar_imaging", "DoselabMC2kV"),
    "DoselabMC2MV": ("pylinac_tpu.planar_imaging", "DoselabMC2MV"),
    "DoselabRLf": ("pylinac_tpu.planar_imaging", "DoselabRLf"),
    "SNCkV": ("pylinac_tpu.planar_imaging", "SNCkV"),
    "SNCMV": ("pylinac_tpu.planar_imaging", "SNCMV"),
    "SNCMV12510": ("pylinac_tpu.planar_imaging", "SNCMV12510"),
    "SNCFSQA": ("pylinac_tpu.planar_imaging", "SNCFSQA"),
    "PTWEPIDQC": ("pylinac_tpu.planar_imaging", "PTWEPIDQC"),
    "IBAPrimusA": ("pylinac_tpu.planar_imaging", "IBAPrimusA"),
    "IMTLRad": ("pylinac_tpu.planar_imaging", "IMTLRad"),
    "IsoAlign": ("pylinac_tpu.planar_imaging", "IsoAlign"),
    "StandardImagingFC2": ("pylinac_tpu.planar_imaging", "StandardImagingFC2"),
    "ACRDigitalMammography": ("pylinac_tpu.planar_imaging", "ACRDigitalMammography"),
    "MaxCountRate": ("pylinac_tpu.nuclear", "MaxCountRate"),
    "PlanarUniformity": ("pylinac_tpu.nuclear", "PlanarUniformity"),
    "CenterOfRotation": ("pylinac_tpu.nuclear", "CenterOfRotation"),
    "TomographicResolution": ("pylinac_tpu.nuclear", "TomographicResolution"),
    "SimpleSensitivity": ("pylinac_tpu.nuclear", "SimpleSensitivity"),
    "FourBarResolution": ("pylinac_tpu.nuclear", "FourBarResolution"),
    "QuadrantResolution": ("pylinac_tpu.nuclear", "QuadrantResolution"),
    "TomographicUniformity": ("pylinac_tpu.nuclear", "TomographicUniformity"),
    "TomographicContrast": ("pylinac_tpu.nuclear", "TomographicContrast"),
    "Nuclide": ("pylinac_tpu.nuclear", "Nuclide"),
    "TrueBeamPlanGenerator": ("pylinac_tpu.plan_generator.dicom", "TrueBeamPlanGenerator"),
    "HalcyonPlanGenerator": ("pylinac_tpu.plan_generator.dicom", "HalcyonPlanGenerator"),
    "MLCShaper": ("pylinac_tpu.plan_generator.mlc", "MLCShaper"),
    "generate_fluences": ("pylinac_tpu.plan_generator.fluence", "generate_fluences"),
    "tg51": ("pylinac_tpu.calibration.tg51", None),
    "trs398": ("pylinac_tpu.calibration.trs398", None),
}


def __getattr__(name):
    import importlib

    if name in _LAZY_IMPORTS:
        module_name, attr = _LAZY_IMPORTS[name]
        module = importlib.import_module(module_name)
        obj = module if attr is None else getattr(module, attr)
        globals()[name] = obj
        return obj
    raise AttributeError(f"module 'pylinac_tpu' has no attribute {name!r}")


def __dir__():
    return sorted(list(globals().keys()) + list(_LAZY_IMPORTS.keys()))
