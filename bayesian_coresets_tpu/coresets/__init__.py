"""Coreset construction API (reference L2 layer, SURVEY.md §1).

Exports mirror the reference package surface
(reference bayesiancoresets/__init__.py:1-2 and coreset/__init__.py).
"""

from .bpsvi import BatchPSVICoreset
from .coreset import Coreset
from .hilbert import HilbertCoreset
from .projector import (
    BlackBoxProjector,
    FamilyProjector,
    Projector,
    TangentFamily,
    blackbox_family,
    center_glls,
    center_lls,
    project,
)
from .exact import gaussian_tangent_family, identity_tangent_family, linreg_tangent_family
from .sampling import UniformSamplingCoreset
from .sparsevi import SparseVICoreset

__all__ = [
    "Coreset",
    "HilbertCoreset",
    "SparseVICoreset",
    "BatchPSVICoreset",
    "UniformSamplingCoreset",
    "Projector",
    "FamilyProjector",
    "BlackBoxProjector",
    "TangentFamily",
    "blackbox_family",
    "center_lls",
    "center_glls",
    "project",
    "gaussian_tangent_family",
    "linreg_tangent_family",
    "identity_tangent_family",
]
