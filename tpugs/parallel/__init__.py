from tpugs.parallel.mesh import make_mesh
from tpugs.parallel.sharded_train import make_dp_train_step
