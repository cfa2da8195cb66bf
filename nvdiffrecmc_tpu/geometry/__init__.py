from .dmtet import DMTetGeometry
from .dlmesh import DLMesh
