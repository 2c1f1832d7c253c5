from .mesh import MeshConfig, create_mesh, local_mesh, with_sharding
from .precision import Precision, PrecisionPolicy

__all__ = [
    "MeshConfig",
    "create_mesh",
    "local_mesh",
    "with_sharding",
    "Precision",
    "PrecisionPolicy",
]
