"""ligero-tpu: a TPU-native Ligero SNARK framework (JAX/Pallas + C++ host).

Public API surface:

    from ligero_tpu import (BN254_FR, BLS12_377_FQ, ArithmeticCircuit,
                            Expression, LigeroCircuit, LigeroProof,
                            test_sponge)
"""

from .fields import BLS12_377_FQ, BN254_FR, FIELDS, FieldSpec

if __import__("os").environ.get("LIGERO_MALLOC_TUNE") != "0":
    # Default ON since the round-4 A/B (atscale_sync_r4f_malloc.json vs
    # atscale_sync_r4f.json: 2^19 warm prove 6.34->5.65 s, verify
    # 3.02->2.60 s): keep gigabyte allocations on the reused brk heap
    # (native.tune_malloc — first-touch faults dominate fresh big buffers
    # on some hosts).  Costs RSS (freed blocks stay mapped);
    # LIGERO_MALLOC_TUNE=0 restores glibc defaults.
    from . import native as _native
    _native.tune_malloc()

__version__ = "0.1.0"

__all__ = [
    "BN254_FR", "BLS12_377_FQ", "FIELDS", "FieldSpec",
    "ArithmeticCircuit", "Expression", "LigeroCircuit", "LigeroProof",
    "test_sponge",
]


def __getattr__(name):
    # lazy imports keep `import ligero_tpu` light (no jax/ctypes at import)
    if name in ("ArithmeticCircuit", "Expression"):
        from . import circuit
        return getattr(circuit, name)
    if name in ("LigeroCircuit", "LigeroProof"):
        from . import ligero
        return getattr(ligero, name)
    if name == "test_sponge":
        from .sponge import test_sponge
        return test_sponge
    raise AttributeError(name)
