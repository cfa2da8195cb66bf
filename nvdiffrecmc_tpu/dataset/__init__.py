from .dataset import Dataset
from .dataset_mesh import DatasetMesh
from .dataset_nerf import DatasetNERF
from .dataset_llff import DatasetLLFF
