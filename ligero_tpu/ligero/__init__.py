from .core import LigeroCircuit, calculate_t
from .proof import InterleavedProof, LigeroProof, LinearConstraintsProof, QuadraticConstraintsProof

__all__ = [
    "LigeroCircuit", "calculate_t", "LigeroProof",
    "InterleavedProof", "LinearConstraintsProof", "QuadraticConstraintsProof",
]
