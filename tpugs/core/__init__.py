from tpugs.core.camera import CameraInfo, CameraModel, qvec_to_rotmat
from tpugs.core.gaussians import GaussianState, inverse_sigmoid
from tpugs.core import sh, transforms
