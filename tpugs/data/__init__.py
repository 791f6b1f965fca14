from tpugs.data.dataset import Dataset, SceneBounds
from tpugs.data.colmap import parse_colmap_sparse, merge_cameras_images
